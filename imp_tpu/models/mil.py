"""MIL baselines: ABMIL + TransMIL (reference ``medmm/modeling/mil/``),
batched over slides with masks."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import TorchLinear, TransLayer
from ..ops.blocks import PPEG, Attn_Net_Gated, masked_attention_pool, square_pad


class ABMIL_MODULE(nn.Module):
    """Gated-attention MIL pooling (reference ``mil/abmil.py:11-55``).
    out_features = size[2]."""

    path_input_dim: int = 512
    model_size_wsi: str = "small"
    dropout: float = 0.25

    @property
    def out_features(self):
        return {"small": 256, "big": 384}[self.model_size_wsi]

    @nn.compact
    def __call__(self, x_path, valid: Optional[jnp.ndarray] = None, deterministic=True):
        size = {
            "small": [self.path_input_dim, 512, 256],
            "big": [1024, 512, 384],
        }[self.model_size_wsi]
        h = nn.relu(TorchLinear(size[1], name="fc")(x_path))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        A, h = Attn_Net_Gated(D=size[2], dropout=self.dropout > 0, name="attention_net")(
            h, deterministic=deterministic
        )
        pooled, _ = masked_attention_pool(A, h, valid)  # [B, 1, 512]
        out = nn.relu(TorchLinear(size[2], name="rho")(pooled[:, 0]))
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class TransMIL_MODULE(nn.Module):
    """TransMIL: fc -> square-pad -> cls -> TransLayer/PPEG/TransLayer -> cls
    (reference ``mil/transmil.py:12-68``; its hardcoded .cuda() disappears).

    ``seq_axis``: sequence parallelism under shard_map — the bag arrives
    token-sharded [B, N/sp, D].  Two layouts (``sp_mode``):

    * ``"gather"``: the cheap per-token fc runs on the shard, the tokens
      gather once (the attention is all-gather-KV anyway, so per-device
      memory is O(N·D) either way), square-pad/cls/PPEG run replicated
      (O(N) work), and the TransLayers band-parallelize the O(N²) attention
      + the qkv/out projections across the seq axis.
    * ``"ring"`` (``TPU.SP_ATTENTION=ring``): SHARD-IN/SHARD-OUT — the bag
      tokens stay [B, N/sp, D] per device end-to-end; the TransLayers run
      :func:`...ring_self_attention` with halo-exchanged residual convs,
      PPEG convs its band of grid rows with 3-row halos, and only the
      replicated cls row ever leaves the shard.  Per-device activations are
      O(N/sp): the layout for bags too large to replicate (100k-patch
      slides).  Requires the global bag (``BAG_PAD``) to be a perfect
      square whose side divides by the seq-axis size (e.g. 10000 → 100²,
      sp ∈ {2,4,5,10}; 102400 → 320²) so bands align to grid rows."""

    path_input_dim: int = 512
    seq_axis: object = None  # Optional[str]
    sp_mode: str = "gather"  # "gather" | "ring"

    out_features: int = 512

    @nn.compact
    def __call__(self, x_path, valid: Optional[jnp.ndarray] = None, deterministic=True):
        if self.seq_axis is not None and self.sp_mode == "ring":
            return self._ring_forward(x_path, valid, deterministic)
        h = nn.relu(TorchLinear(512, name="_fc1")(x_path))
        if valid is not None:
            h = h * valid[..., None]
        if self.seq_axis is not None:
            from ..ops.attention import gather_tokens_replicated

            h = gather_tokens_replicated(h, self.seq_axis, axis=1)
            if valid is not None:
                valid = gather_tokens_replicated(valid, self.seq_axis, axis=1)
        h, valid_sq, side = square_pad(h, valid)
        B = h.shape[0]
        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, 512)
        )
        h = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), h], axis=1)
        vmask = None
        if valid_sq is not None:
            vmask = jnp.concatenate([jnp.ones((B, 1), bool), valid_sq], axis=1)
        h = TransLayer(dim=512, seq_axis=self.seq_axis, name="layer1")(
            h, mask=vmask, deterministic=deterministic
        )
        h = PPEG(dim=512, name="pos_layer")(h, side, side)
        h = TransLayer(dim=512, seq_axis=self.seq_axis, name="layer2")(
            h, mask=vmask, deterministic=deterministic
        )
        h = nn.LayerNorm(epsilon=1e-5)(h)
        return h[:, 0]

    def _ring_forward(self, x_band, valid, deterministic):
        """Shard-in/shard-out body.  Parameter names/shapes are identical to
        the replicated path (checkpoints interchange); the returned cls is
        psum-broadcast from device 0 so shard_map can prove replication."""
        import math as _math

        from jax import lax

        ax = self.seq_axis
        sp = lax.axis_size(ax)
        me = lax.axis_index(ax)
        B, nb, _ = x_band.shape
        n_global = nb * sp
        side = int(_math.isqrt(n_global))
        if side * side != n_global:
            raise ValueError(
                f"TPU.SP_ATTENTION=ring needs a perfect-square global bag "
                f"(got {n_global}); set DATASET.BAG_PAD to a square "
                f"(10000, 4096, 102400, ...)"
            )
        if side % sp != 0 or side // sp < 3:
            raise ValueError(
                f"ring mode needs the grid side ({side}) divisible by the "
                f"seq-axis size ({sp}) with >= 3 grid rows per device"
            )

        h = nn.relu(TorchLinear(512, name="_fc1")(x_band))
        if valid is not None:
            h = h * valid[..., None]
        cls = self.param(
            "cls_token", nn.initializers.normal(stddev=1.0), (1, 1, 512)
        )
        cls_b = jnp.tile(cls, (B, 1, 1))
        h, cls_b = TransLayer(dim=512, seq_axis=ax, sp_mode="ring",
                              name="layer1")(
            h, mask=valid, deterministic=deterministic, cls=cls_b
        )
        h = PPEG(dim=512, seq_axis=ax, name="pos_layer")(h, side, side)
        h, cls_b = TransLayer(dim=512, seq_axis=ax, sp_mode="ring",
                              name="layer2")(
            h, mask=valid, deterministic=deterministic, cls=cls_b
        )
        # the final LayerNorm is per-token: applying it to the cls row alone
        # matches the replicated path's h[:, 0] (same auto-name LayerNorm_0)
        cls_b = nn.LayerNorm(epsilon=1e-5)(cls_b)[:, 0]
        # broadcast device 0's cls row: every device computed the same value
        # up to logsumexp merge order; psum-select makes it bit-identical
        # AND provably replicated for shard_map's out_specs=P() checker
        return lax.psum(jnp.where(me == 0, cls_b, jnp.zeros_like(cls_b)), ax)
