from dynseg.models.blocks import DilatedConvBlock, ScoreHead  # noqa: F401
from dynseg.models.dilated import DilatedDenseNet, DilatedNet, build_model  # noqa: F401
