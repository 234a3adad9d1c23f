"""Model unit tests (SURVEY.md §4): every variant preserves spatial shape
at EVERY patch size with ONE parameter set — the invariant behind dynamic
multi-context training (§3.3)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynseg.config import NET_TYPES, ModelConfig
from dynseg.models.dilated import build_model


@pytest.mark.parametrize("net_type", NET_TYPES)
def test_shape_preserved_across_patch_sizes(net_type):
    cfg = ModelConfig(net_type=net_type, num_classes=5, num_input_bands=4)
    model = build_model(cfg)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 25, 25, 4)))
    for s in (25, 33, 65):
        y = model.apply(variables, jnp.zeros((2, s, s, 4)), train=False)
        assert y.shape == (2, s, s, 5), (net_type, s)
        assert y.dtype == jnp.float32


def test_bn_state_updates_in_train_mode():
    cfg = ModelConfig(num_classes=2, num_input_bands=3)
    model = build_model(cfg)
    x = jax.random.normal(jax.random.key(1), (2, 25, 25, 3))
    variables = model.init(jax.random.key(0), x)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not jnp.allclose(a, b) for a, b in zip(before, after)
    ), "train=True must update running BN stats"


def test_bfloat16_compute_path():
    cfg = ModelConfig(num_classes=2, num_input_bands=3, compute_dtype="bfloat16")
    model = build_model(cfg)
    x = jax.random.normal(jax.random.key(1), (1, 25, 25, 3))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x, train=False)
    assert y.dtype == jnp.float32  # logits promoted for stable CE
    # params stay float32
    assert all(
        p.dtype == jnp.float32 for p in jax.tree.leaves(variables["params"])
    )
    # the bf16 path must actually COMPUTE in bf16 (review r2: dtype-only
    # checks passed even if compute_dtype were ignored): same params run
    # in f32 give a measurably different result
    cfg32 = dataclasses.replace(cfg, compute_dtype="float32")
    y32 = build_model(cfg32).apply(variables, x, train=False)
    diff = float(jnp.abs(y - y32).max())
    assert diff > 1e-4, f"bf16 and f32 outputs identical (diff={diff})"
    np.testing.assert_allclose(np.asarray(y), np.asarray(y32),
                               atol=0.15, rtol=0.3)  # ...but close


def test_dense_variant_differs_from_sequential():
    x = jax.random.normal(jax.random.key(1), (1, 25, 25, 3))
    cfg_a = ModelConfig(net_type="dilated_icpr_rate6", num_classes=2)
    cfg_b = ModelConfig(net_type="dilated_icpr_rate6_densely", num_classes=2)
    ma, mb = build_model(cfg_a), build_model(cfg_b)
    va = ma.init(jax.random.key(0), x)
    vb = mb.init(jax.random.key(0), x)
    na = sum(p.size for p in jax.tree.leaves(va["params"]))
    nb = sum(p.size for p in jax.tree.leaves(vb["params"]))
    assert nb > na  # dense concat inflates input channels


def test_pool_backward_pallas_flag_cpu_fallback(rng):
    """ModelConfig.pool_backward='pallas' must train on CPU too (the
    support gate routes the VJP back to XLA off-TPU) and produce the
    same gradients as the default config on tie-free input."""
    import dataclasses

    import optax  # noqa: F401  (ensures train deps present)

    from dynseg.config import ModelConfig
    from dynseg.models.dilated import build_model

    cfg = ModelConfig(net_type="dilated_grsl", num_classes=3,
                      num_input_bands=3, width_multiplier=0.125,
                      use_batch_norm=False)
    cfg_p = dataclasses.replace(cfg, pool_backward="pallas")
    x = jnp.asarray(rng.normal(size=(2, 9, 9, 3)).astype(np.float32))
    m1, m2 = build_model(cfg), build_model(cfg_p)
    v = m1.init(jax.random.key(0), x)

    def loss(model, v):
        return (model.apply(v, x) ** 2).mean()

    g1 = jax.grad(lambda v: loss(m1, v))(v)
    g2 = jax.grad(lambda v: loss(m2, v))(v)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_bn_momentum_threads_into_batch_stats():
    """--bn_momentum reaches the BatchNorm layers: a slower momentum
    moves the running statistics LESS per batch."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynseg.config import ModelConfig
    from dynseg.models.dilated import build_model

    x = jax.random.normal(jax.random.key(0), (4, 9, 9, 3)) * 5.0

    def stats_delta(momentum):
        cfg = ModelConfig(net_type="dilated_grsl", num_classes=2,
                          num_input_bands=3, width_multiplier=0.125,
                          bn_momentum=momentum)
        model = build_model(cfg)
        v = model.init(jax.random.key(1), jnp.zeros((1, 9, 9, 3)),
                       train=False)
        _, mut = model.apply(v, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(2)})
        return sum(float(jnp.abs(a - b).sum()) for a, b in zip(
            jax.tree.leaves(mut["batch_stats"]),
            jax.tree.leaves(v["batch_stats"])))

    d_fast, d_slow = stats_delta(0.9), stats_delta(0.99)
    assert d_slow < d_fast * 0.2, (d_fast, d_slow)  # (1-m) scales the step
