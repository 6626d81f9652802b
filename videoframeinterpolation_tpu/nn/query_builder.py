"""t-conditioned coarse query builder (reference ``modules/query_builder.py``).

Builds the initial intermediate-frame feature at 1/16 resolution from the two
coarsest source features: symmetric motion features conditioned on ``t`` and
``1-t``, two separate flow-seeded deformable convs, and a blending conv.
Returns ``(feat_t, ft0, ft1)`` where the flows are each DCN's predicted
offset flow.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from .blocks import ConvPReLU, PReLU, conv
from .dcn_layer import DeformableConv2d

Array = jax.Array


class DCNInterFeatBuilderWithT(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(
        self, feat0: Array, feat1: Array, t: Array
    ) -> tuple[Array, Array, Array]:
        B, H, W, C = feat0.shape
        nf = self.features
        t_map = jnp.broadcast_to(t.astype(feat0.dtype), (B, H, W, 1))

        mk_motion = nn.Sequential([
            ConvPReLU(nf, dtype=self.dtype, name="motion1"),
            ConvPReLU(nf, dtype=self.dtype, name="motion2"),
        ])
        f01_motion = mk_motion(jnp.concatenate([feat0, feat1, t_map], axis=-1))
        f10_motion = mk_motion(
            jnp.concatenate([feat1, feat0, 1.0 - t_map], axis=-1)
        )

        feat_t_from_0, ft0 = DeformableConv2d(nf, dtype=self.dtype, name="dcnt0")(
            feat0, f01_motion
        )
        feat_t_from_1, ft1 = DeformableConv2d(nf, dtype=self.dtype, name="dcnt1")(
            feat1, f10_motion
        )

        h = jnp.concatenate([feat_t_from_0, feat_t_from_1], axis=-1)
        h = ConvPReLU(nf, dtype=self.dtype, name="blend1")(h)
        out = conv(nf, dtype=self.dtype, name="blend2")(h)
        return out, ft0, ft1
