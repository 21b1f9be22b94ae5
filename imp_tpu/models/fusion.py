"""Multimodal fusion baselines: MCAT, CMTA, Porpoise, HFB
(reference ``medmm/modeling/fusion/``), batched with masks.

The reference modules carry batch-size-1 assumptions (``.squeeze()`` +
``torch.mm`` pooling, HFB's row-concatenation); these are restructured into
explicit per-sample semantics that coincide with the reference at B=1 and
remain correct for B>1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import MultiheadAttention, TorchLinear
from ..ops.blocks import (
    Attn_Net_Gated,
    BilinearFusion,
    LRBilinearFusion,
    SNN_Block,
    Transformer_G,
    Transformer_P,
    masked_attention_pool,
)


class TorchTransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder layer with ReLU FF — semantics of
    ``nn.TransformerEncoderLayer(d_model, nhead, dim_ff, act='relu')``
    (used by MCAT, ref ``fusion/mcat.py:47-54``)."""

    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn_out, _ = MultiheadAttention(
            embed_dim=self.d_model, num_heads=self.nhead, dropout=self.dropout,
            name="self_attn",
        )(x, x, x, need_raw=False, deterministic=deterministic)
        attn_out = nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + attn_out)
        y = nn.relu(TorchLinear(self.dim_feedforward, name="linear1")(x))
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = TorchLinear(self.d_model, name="linear2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + y)


class SigNetworks(nn.Module):
    """Per-signature SNN chains (ref ``fusion/mcat.py:32-40``)."""

    omic_sizes: Tuple[int, ...]
    hidden: Tuple[int, ...]
    dropout: float = 0.25

    @nn.compact
    def __call__(self, x_omic, deterministic: bool = True):
        outs = []
        start = 0
        for idx, size in enumerate(self.omic_sizes):
            sig = x_omic[:, start : start + size]
            start += size
            h = SNN_Block(self.hidden[0], dropout=0.25, name=f"sig{idx}_fc0")(
                sig, deterministic=deterministic
            )
            for j, dim in enumerate(self.hidden[1:]):
                h = SNN_Block(dim, dropout=self.dropout, name=f"sig{idx}_fc{j+1}")(
                    h, deterministic=deterministic
                )
            outs.append(h)
        return jnp.stack(outs, axis=1)  # [B, n_sigs, D]


class MCAT(nn.Module):
    """Genomic-guided co-attention (ref ``fusion/mcat.py:11-103``)."""

    fusion: str = "concat"
    path_input_dim: int = 512
    omic_sizes: Tuple[int, ...] = (200, 200, 200, 200, 200)
    model_size_wsi: str = "small"
    model_size_omic: str = "small"
    dropout: float = 0.10

    out_features: int = 256

    @nn.compact
    def __call__(
        self,
        x_path,
        x_omic,
        path_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        size = {"small": [self.path_input_dim, 256, 256],
                "big": [self.path_input_dim, 512, 384]}[self.model_size_wsi]
        hidden = {"small": (256, 256), "big": (1024, 1024, 1024, 256)}[
            self.model_size_omic
        ]
        h = nn.relu(TorchLinear(size[1], name="wsi_net")(x_path))
        h_path_bag = nn.Dropout(self.dropout)(h, deterministic=deterministic)

        h_omic_bag = SigNetworks(
            omic_sizes=self.omic_sizes, hidden=hidden, dropout=self.dropout,
            name="sig_networks",
        )(x_omic, deterministic=deterministic)  # [B, n_sigs, 256]

        # co-attention: omics queries over the patch bag (raw weights kept
        # for interpretability, ref mcat.py:78)
        h_path_coattn, A_coattn = MultiheadAttention(
            embed_dim=256, num_heads=1, name="coattn"
        )(h_omic_bag, h_path_bag, h_path_bag, key_valid=path_valid, need_raw=True,
          deterministic=deterministic)

        ht = h_path_coattn
        for i in range(2):
            ht = TorchTransformerEncoderLayer(
                dropout=self.dropout, name=f"path_transformer_{i}"
            )(ht, deterministic=deterministic)
        A_path, hp = Attn_Net_Gated(
            D=size[2], dropout=self.dropout > 0, name="path_attention_head"
        )(ht, deterministic=deterministic)
        h_path, _ = masked_attention_pool(A_path, hp)
        h_path = nn.relu(TorchLinear(size[2], name="path_rho")(h_path[:, 0]))
        h_path = nn.Dropout(self.dropout)(h_path, deterministic=deterministic)

        ho = h_omic_bag
        for i in range(2):
            ho = TorchTransformerEncoderLayer(
                dropout=self.dropout, name=f"omic_transformer_{i}"
            )(ho, deterministic=deterministic)
        A_omic, hoo = Attn_Net_Gated(
            D=size[2], dropout=self.dropout > 0, name="omic_attention_head"
        )(ho, deterministic=deterministic)
        h_omic, _ = masked_attention_pool(A_omic, hoo)
        h_omic = nn.relu(TorchLinear(size[2], name="omic_rho")(h_omic[:, 0]))
        h_omic = nn.Dropout(self.dropout)(h_omic, deterministic=deterministic)

        if self.fusion == "bilinear":
            out = BilinearFusion(
                dim1=256, dim2=256, scale_dim1=8, scale_dim2=8, mmhid=256, name="mm"
            )(h_path, h_omic, deterministic=deterministic)
        else:
            z = jnp.concatenate([h_path, h_omic], axis=1)
            z = nn.relu(TorchLinear(size[2], name="mm_fc1")(z))
            out = nn.relu(TorchLinear(size[2], name="mm_fc2")(z))
        return out, {"coattn": A_coattn, "path": A_path, "omic": A_omic}


class CMTA(nn.Module):
    """Cross-modal translation + alignment (ref ``fusion/cmta.py:12-142``)."""

    fusion: str = "concat"
    path_input_dim: int = 512
    omic_sizes: Tuple[int, ...] = (200, 200, 200, 200, 200)
    model_size: str = "small"
    dropout: float = 0.25

    out_features: int = 256

    @nn.compact
    def __call__(
        self,
        x_path,
        x_omic,
        path_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        p_hidden = {"small": [self.path_input_dim, 256, 256],
                    "large": [self.path_input_dim, 512, 256]}[self.model_size]
        g_hidden = {"small": (1024, 256), "large": (1024, 1024, 1024, 256)}[
            self.model_size
        ]
        h = x_path
        for i, dim in enumerate(p_hidden[1:]):
            h = nn.relu(TorchLinear(dim, name=f"pathomics_fc_{i}")(h))
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        pathomics_features = h

        genomics_features = SigNetworks(
            omic_sizes=self.omic_sizes, hidden=g_hidden, dropout=0.25,
            name="genomics_fc",
        )(x_omic, deterministic=deterministic)

        cls_pe, tok_pe = Transformer_P(feature_dim=256, name="pathomics_encoder")(
            pathomics_features, valid=path_valid, deterministic=deterministic
        )
        cls_ge, tok_ge = Transformer_G(feature_dim=256, name="genomics_encoder")(
            genomics_features, deterministic=deterministic
        )

        p_in_g, _ = MultiheadAttention(embed_dim=256, num_heads=1, name="P_in_G_Att")(
            tok_pe, tok_ge, tok_ge, need_raw=True, deterministic=deterministic
        )
        g_in_p, _ = MultiheadAttention(embed_dim=256, num_heads=1, name="G_in_P_Att")(
            tok_ge, tok_pe, tok_pe, deterministic=deterministic
        )

        cls_pd, _ = Transformer_P(feature_dim=256, name="pathomics_decoder")(
            p_in_g, deterministic=deterministic
        )
        cls_gd, _ = Transformer_G(feature_dim=256, name="genomics_decoder")(
            g_in_p, deterministic=deterministic
        )

        vp = (cls_pe + cls_pd) / 2
        vg = (cls_ge + cls_gd) / 2
        if self.fusion == "bilinear":
            out = BilinearFusion(
                dim1=256, dim2=256, scale_dim1=8, scale_dim2=8, mmhid=256, name="mm"
            )(vp, vg, deterministic=deterministic)
        else:
            z = jnp.concatenate([vp, vg], axis=1)
            z = nn.relu(TorchLinear(256, name="mm_fc1")(z))
            out = nn.relu(TorchLinear(256, name="mm_fc2")(z))
        cls_tokens = {
            "cls_token_pathomics_encoder": cls_pe,
            "cls_token_pathomics_decoder": cls_pd,
            "cls_token_genomics_encoder": cls_ge,
            "cls_token_genomics_decoder": cls_gd,
        }
        return out, cls_tokens


class Porpoise(nn.Module):
    """ABMIL pathology + SNN omics + gated bilinear/LRB/concat/add fusion
    (ref ``fusion/porpoise.py:10-107``)."""

    fusion: str = "bilinear"
    omic_input_dim: int = 1000
    path_input_dim: int = 512
    model_size_wsi: str = "small"
    model_size_omic: str = "small"
    scale_dim1: int = 8
    scale_dim2: int = 8
    gate_path: int = 1
    gate_omic: int = 1
    skip: bool = True
    dropinput: float = 0.10
    use_mlp: bool = False
    dropout: float = 0.1

    out_features: int = 256

    @nn.compact
    def __call__(
        self,
        x_path,
        x_omic,
        path_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        size = {"small": [self.path_input_dim, 512, 256],
                "big": [self.path_input_dim, 512, 384]}[self.model_size_wsi]
        hidden = {"small": (256, 256), "big": (1024, 1024, 1024, 256)}[
            self.model_size_omic
        ]
        h = x_path
        if self.dropinput:
            h = nn.Dropout(self.dropinput)(h, deterministic=deterministic)
        h = nn.relu(TorchLinear(size[1], name="fc_h")(h))
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        A, hh = Attn_Net_Gated(
            D=size[2], dropout=self.dropout > 0, name="attention_net_h"
        )(h, deterministic=deterministic)
        h_path, _ = masked_attention_pool(A, hh, path_valid)
        h_path = nn.relu(TorchLinear(size[2], name="rho_h")(h_path[:, 0]))
        h_path = nn.Dropout(self.dropout)(h_path, deterministic=deterministic)

        from ..ops.blocks import MLP_Block

        Block = MLP_Block if self.use_mlp else SNN_Block
        ho = x_omic[:, : self.omic_input_dim]
        ho = Block(hidden[0], dropout=0.25, name="fc_omic_0")(
            ho, deterministic=deterministic
        )
        for j, dim in enumerate(hidden[1:]):
            ho = Block(dim, dropout=0.25, name=f"fc_omic_{j+1}")(
                ho, deterministic=deterministic
            )

        if self.fusion == "bilinear":
            return BilinearFusion(
                dim1=256, dim2=256, scale_dim1=self.scale_dim1,
                gate1=self.gate_path, scale_dim2=self.scale_dim2,
                gate2=self.gate_omic, skip=int(self.skip), mmhid=256, name="mm",
            )(h_path, ho, deterministic=deterministic)
        if self.fusion == "lrb":
            return LRBilinearFusion(
                dim1=256, dim2=256, scale_dim1=self.scale_dim1,
                gate1=self.gate_path, scale_dim2=self.scale_dim2,
                gate2=self.gate_omic, name="mm",
            )(h_path, ho, deterministic=deterministic)
        if self.fusion == "concat":
            z = jnp.concatenate([h_path, ho], axis=1)
            z = nn.relu(TorchLinear(size[2], name="mm_fc1")(z))
            return nn.relu(TorchLinear(size[2], name="mm_fc2")(z))
        if self.fusion == "add":
            return h_path + ho
        raise ValueError(self.fusion)


class SubNet(nn.Module):
    hidden_size: int

    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(TorchLinear(self.hidden_size, name="enc1")(x))
        return jnp.tanh(TorchLinear(self.hidden_size, name="enc2")(x))


class HFB(nn.Module):
    """Hierarchical factorized bilinear fusion (ref ``fusion/hfb.py:22-190``).

    Per-sample restructuring of the reference's row-stacked batch-1 layout:
    each modality contributes 2 rows per sample ([B,2,.]), batch-norm runs
    over the flattened rows, and the final encoder concatenates the pair.
    Two reference quirks kept by spec (they define the trained function):
    ``cona_x_a = sc * gene_x`` (not cona_x, ref ``:150``) and
    ``Linear_gene_a`` reused for all three inter projections (ref ``:174-176``).
    """

    omic_input_dim: int = 250
    path_input_dim: int = 512
    hidden_dims: Tuple[int, ...] = (128, 128, 128, 256)
    output_dims: Tuple[int, ...] = (128, 128, 1)
    dropouts: Tuple[float, ...] = (0.1, 0.1, 0.1, 0.2)
    rank: int = 20
    fac_drop: float = 0.10

    @property
    def out_features(self):
        return self.hidden_dims[0] + self.output_dims[0] + self.output_dims[1]

    @nn.compact
    def __call__(
        self,
        x_path,
        x_omic,
        path_valid: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        gh, ph, ch, _ = self.hidden_dims
        oi, oe, _ = self.output_dims
        joint_intra = self.rank * oi
        joint_inter = self.rank * oe
        in_size = gh + oi + oe
        B = x_path.shape[0]

        # omics split 500+500 -> 2x250 rows per sample (ref :104-106)
        x1 = x_omic[:, :500].reshape(B * 2, 250)
        x2 = x_omic[:, 500:1000].reshape(B * 2, 250)
        gene_feature = SubNet(gh, name="encoder_gene")(x1)  # [2B, gh]
        cona_feature = SubNet(ch, name="encoder_cona")(x2)
        path_feature = SubNet(ph, name="encoder_path")(x_path)  # [B, N, ph]

        # two attention pools -> 2 rows per sample (ref :113-123)
        A1, hp1 = Attn_Net_Gated(D=ph, dropout=True, name="attention_net1")(
            path_feature, deterministic=deterministic
        )
        p1, _ = masked_attention_pool(A1, hp1, path_valid)
        A2, hp2 = Attn_Net_Gated(D=ph, dropout=True, name="attention_net2")(
            path_feature, deterministic=deterministic
        )
        p2, _ = masked_attention_pool(A2, hp2, path_valid)
        path_rows = jnp.concatenate([p1, p2], axis=1).reshape(B * 2, ph)

        drop = lambda x: nn.Dropout(self.fac_drop)(x, deterministic=deterministic)

        def mfb(x1v, x2v, output_dim):
            f = drop(x1v * x2v)
            f = f.reshape(f.shape[0], output_dim, self.rank).sum(-1)
            f = jnp.sqrt(nn.relu(f)) - jnp.sqrt(nn.relu(-f))
            n = jnp.linalg.norm(f, axis=-1, keepdims=True)
            return f / jnp.maximum(n, 1e-12)

        gene_h = TorchLinear(joint_intra, name="Linear_gene")(gene_feature)
        path_h = TorchLinear(joint_intra, name="Linear_path")(path_rows)
        cona_h = TorchLinear(joint_intra, name="Linear_cona")(cona_feature)

        intra_gene = mfb(gene_h, gene_h, oi)
        intra_path = mfb(path_h, path_h, oi)
        intra_cona = mfb(cona_h, cona_h, oi)

        gene_x = jnp.concatenate([gene_feature, intra_gene], axis=1)
        path_x = jnp.concatenate([path_rows, intra_path], axis=1)
        cona_x = jnp.concatenate([cona_feature, intra_cona], axis=1)

        attention = TorchLinear(1, name="attention_fc")
        sg = jax.nn.sigmoid(attention(gene_x))
        sp = jax.nn.sigmoid(attention(path_x))
        sc = jax.nn.sigmoid(attention(cona_x))

        gene_x_a = sg * gene_x
        path_x_a = sp * path_x
        cona_x_a = sc * gene_x  # reference quirk (ref :150)

        unimodal = gene_x_a + path_x_a + cona_x_a

        g = jax.nn.softmax(gene_x_a, axis=1)
        p = jax.nn.softmax(path_x_a, axis=1)
        c = jax.nn.softmax(cona_x_a, axis=1)
        sgv, spv, scv = sg[:, 0], sp[:, 0], sc[:, 0]
        dot = lambda a, b: jnp.sum(a * b, axis=1)
        sgp = 1.0 / (dot(g, p) + 0.5) * (sgv + spv)
        sgc = 1.0 / (dot(g, c) + 0.5) * (sgv + scv)
        spc = 1.0 / (dot(p, c) + 0.5) * (spv + scv)
        normalize = jax.nn.softmax(jnp.stack([sgp, sgc, spc], axis=1), axis=1)

        inter_proj = TorchLinear(joint_inter, name="Linear_gene_a")
        gene_l = inter_proj(gene_x_a)
        path_l = inter_proj(path_x_a)  # reference quirk: same projection
        cona_l = inter_proj(cona_x_a)

        inter_gp = mfb(gene_l, path_l, oe)
        inter_gc = mfb(gene_l, cona_l, oe)
        inter_pc = mfb(path_l, cona_l, oe)
        bimodal = (
            normalize[:, 0:1] * inter_gp
            + normalize[:, 1:2] * inter_gc
            + normalize[:, 2:3] * inter_pc
        )

        fusion = jnp.concatenate([unimodal, bimodal], axis=1)  # [2B, in_size]
        fusion = nn.BatchNorm(
            use_running_average=deterministic, name="norm"
        )(fusion)
        fusion = fusion.reshape(B, 2 * in_size)
        return TorchLinear(in_size, name="Linear_encoder")(fusion)
