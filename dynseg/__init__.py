"""dynseg — TPU-native dynamic multi-context remote-sensing segmentation.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of
keillernogueira/dynamic-rs-segmentation (Nogueira et al., "Dynamic
Multicontext Segmentation of Remote Sensing Images Based on Convolutional
Networks", IEEE TGRS 2019; see SURVEY.md for the full component map).

Design pillars (TPU-first, not a translation):
  * All networks are stride-1 / SAME dilated ConvNets that never downsample,
    so one parameter set serves every patch size (SURVEY.md §3.3).
  * Dynamic multi-context training: a host-side scheduler picks the patch
    size per step from a score-driven distribution; each patch size is a
    *bucketed, statically-shaped, pre-compiled* jitted step — XLA never
    recompiles mid-training (SURVEY.md C12).
  * Full-tile inference is multi-scale sliding-window with softmax-probability
    overlap-add voting, executed on device (SURVEY.md C15).
  * Data parallelism via `jax.sharding.Mesh` + jit-with-shardings; XLA
    inserts the gradient all-reduce over ICI (SURVEY.md §2 parallelism table).
"""

__version__ = "0.1.0"

from dynseg import config  # noqa: F401
