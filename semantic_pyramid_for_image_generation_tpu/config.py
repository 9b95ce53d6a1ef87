"""Configuration for the semantic-pyramid GAN.

The reference hard-codes nearly all of these (see /root/reference/models.py and
/root/reference/misc.py:14-15). We promote them to a single frozen config so the
same code path serves (a) full-scale 256x256 training with reference-matching
architecture, and (b) width-reduced configs for CPU multi-device dry runs/tests.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


def _scaled(c: int, factor: float) -> int:
    """Channel scaling with the reference's `int(c // factor)` semantics
    (/root/reference/models.py:34-61, :117-128)."""
    return int(c // factor)


@dataclasses.dataclass(frozen=True)
class PyramidGANConfig:
    # --- image / class space -------------------------------------------------
    image_size: int = 256              # output resolution (fixed 4*2^6 pipeline)
    out_channels: int = 3
    num_classes: int = 365             # Places365
    latent_dim: int = 128              # main.py latent (models.py:15-16)

    # --- width scaling -------------------------------------------------------
    channels_factor: float = 1.0       # reference --channel_factor (main.py:18-19)
    vgg_width_factor: int = 1          # divides VGG conv/fc7 widths (tests/dryrun only)

    # --- mask schedule --------------------------------------------------------
    # Probability of the spatially-varying random-shapes branch in the
    # training mask schedule (hidden constant in the reference,
    # /root/reference/misc.py:17 — promoted to config per SURVEY.md 5).
    p_random_mask: float = 0.3

    # --- behavior switches ---------------------------------------------------
    # Reproduce the reference's broadcast quirk where the projection
    # discriminator returns (B, B, 128) instead of a (B, 1) score
    # (/root/reference/models.py:146-155; losses mean over all elements).
    compat_projection: bool = True
    # Sync batch-norm statistics across the data mesh (reference DataParallel
    # uses device-0 sub-batch stats; global stats are strictly better and are
    # what jit/GSPMD gives for free on a sharded batch).
    # Kept as doc-flag; jit semantics always give global-batch stats.
    bn_cross_replica: bool = True

    # --- dtypes --------------------------------------------------------------
    # Computation dtype for the hot path ('float32' | 'bfloat16'). Params and
    # norm statistics always stay float32.
    compute_dtype: str = "float32"
    # Rematerialize G/D residual blocks in the backward pass (jax.checkpoint):
    # ~1.3x forward FLOPs for a large activation-memory cut -> bigger batches.
    remat_blocks: bool = False

    # ------------------------------------------------------------------------
    # Derived architecture contract
    # ------------------------------------------------------------------------
    @property
    def vgg_conv_channels(self) -> Tuple[int, ...]:
        """Channels of the 5 VGG pool taps, shallow->deep (SURVEY.md 2.7)."""
        f = self.vgg_width_factor
        return (64 // f, 128 // f, 256 // f, 512 // f, 512 // f)

    @property
    def vgg_fc7_dim(self) -> int:
        return 4096 // self.vgg_width_factor

    @property
    def pyramid_spatial(self) -> Tuple[int, ...]:
        """Spatial dims of the 5 conv pyramid levels, shallow->deep."""
        s = self.image_size
        return (s // 2, s // 4, s // 8, s // 16, s // 32)

    @property
    def feature_shapes(self) -> Tuple[Tuple[int, ...], ...]:
        """Per-sample NHWC feature shapes, shallow->deep (7 levels).

        Mirrors the contract of /root/reference/misc.py:14-15 (mask shapes) and
        models.py:201-213 (taps), transposed to NHWC.
        """
        convs = tuple(
            (hw, hw, c)
            for hw, c in zip(self.pyramid_spatial, self.vgg_conv_channels)
        )
        return convs + ((self.vgg_fc7_dim,), (self.num_classes,))

    @property
    def mask_shapes(self) -> Tuple[Tuple[int, ...], ...]:
        """Per-sample mask shapes, shallow->deep. Conv masks are (H, W, 1)."""
        convs = tuple((hw, hw, 1) for hw in self.pyramid_spatial)
        return convs + ((self.vgg_fc7_dim,), (self.num_classes,))

    @property
    def generator_block_channels(self) -> Tuple[Tuple[int, int], ...]:
        """(in, out) channels of the 5 generator residual blocks, deep->shallow
        (/root/reference/models.py:37-49)."""
        cf = self.channels_factor
        c512, c256, c128, c64 = (
            _scaled(512, cf), _scaled(256, cf), _scaled(128, cf), _scaled(64, cf))
        return ((c512, c512), (c512, c512), (c512, c256), (c256, c128), (c128, c64))

    @property
    def generator_attention_channels(self) -> int:
        return _scaled(256, self.channels_factor)

    @property
    def discriminator_block_channels(self) -> Tuple[Tuple[int, int], ...]:
        """(in, out) for input block + 6 residual blocks
        (/root/reference/models.py:117-124)."""
        cf = self.channels_factor
        c = lambda x: _scaled(x, cf)  # noqa: E731
        return (
            (self.out_channels, c(64)),
            (c(64), c(128)),
            (c(128), c(256)),
            (c(256), c(256)),
            (c(256), c(256)),
            (c(256), c(512)),
            (c(512), c(768)),
        )

    @property
    def discriminator_attention_channels(self) -> int:
        return _scaled(256, self.channels_factor)

    def tiny(self) -> "PyramidGANConfig":
        """A width-reduced config for CPU tests and multi-chip dry runs."""
        return dataclasses.replace(
            self, channels_factor=8.0, vgg_width_factor=8, num_classes=16)


# Reference training defaults (/root/reference/main.py:12-16,
# /root/reference/model_wrapper.py:93-94).
DEFAULT_BATCH_SIZE = 20
DEFAULT_LR = 1e-5
DEFAULT_W_REC = 0.1
DEFAULT_W_DIV = 0.1
DEFAULT_FID_VAL_IMAGES = 6000
