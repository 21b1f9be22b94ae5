"""UMEML_GAN — the flagship prototype model with CycleGAN omics imputation
(reference ``medmm/modeling/models/umeml_gan.py:232-706``).

TPU-first re-design:

* the bag enters as fixed-shape [B, N_pad, Dp] + boolean mask (replacing the
  -10000 sentinel strip loop, ref ``:401-410``);
* the six per-gene-group omics encoders take their index lists from the
  DataManager instead of reading CSVs inside the model (ref ``:347-369``);
* the greedy top-K path/omic pairing inside the bottleneck is the
  vectorized op from ``imp_tpu.ops.pairing`` (ref ``:123-221``);
* the three internal GAN optimizers stepped inside ``forward()``
  (ref ``:461-490``) become separate loss methods (:meth:`gen_loss`,
  :meth:`dis_p_loss`, :meth:`dis_o_loss`) whose gradients the trainer takes
  w.r.t. the generator/discriminator parameter partitions inside ONE jitted
  train step;
* importance dumps to ``{split}_{path,omic}.txt`` move to the trainer
  (host side) — the model just returns the arrays (ref ``:575-587`` writes
  files inside forward()).

Documented deviations from the reference (by spec, see SURVEY.md §7):
* ``g_omic_net`` is omitted — the reference constructs it but its output is
  dead code in UMEML_GAN (``:421-422``, concat commented out);
* PLIP prototype init: the reference calls ``get_path_prorotypes()`` then
  immediately overwrites it with ``reset()`` uniform init (``:310-315``), so
  the default here is uniform init; set ``MODEL.UMEML.PROTO_INIT=plip`` to
  keep the PLIP initialization the paper intends;
* main-loss gradients flow into the generators through the replace /
  generation paths exactly as in the reference; discriminators are excluded
  from the main optimizer (in torch they are skipped because their grads
  are None).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..losses.survival import kd_loss as kd_loss_fn
from ..ops.attention import TorchLinear, TransLayer
from ..ops.blocks import BilinearFusion
from ..ops.modularity import compute_modularity_pair
from .layers import (
    Block,
    BottleneckAttentionBlock,
    Discriminator,
    Generator,
    GroupedLinear,
    PathProtoGenerator,
    proto_init,
    transform_importance,
    transform_importance_to_half_one_point_five,
    uniform01,
)


# Run the head's two bottleneck passes (plain ref :514 and importance-
# scaled ref :649-678) as ONE batched call over 2B rows. The importance
# weights depend only on (h_path, h_omic), never on the first pass, and
# batch is a parallel dim through pairing/TransLayers/fusion/classifier,
# so per-row numerics are unchanged; the head is dispatch-bound at these
# token counts (B=2, ~17 tokens) and this halves its op count.
# False restores two sequential passes (rescue / A-B knob).
HEAD_FUSED = True

# Bag-activations-only mixed precision (A/B knob, BASELINE.md r5): when set
# to e.g. jnp.bfloat16, the [B, N, D] bag activations (the HBM-bound ~80 MB
# fp32 per slide at bag 10k — post-path_net ReLU, dropout output, the
# prototype cross-attention K/V reads) are stored/read in that dtype, while
# params, losses, the pinv chain and the modularity kernels stay fp32 (the
# modularity `_prepare` casts its input back to fp32 unconditionally, and
# the attention einsums accumulate fp32 via preferred_element_type). None
# (default) keeps the all-fp32 layout.
BAG_DTYPE = None

# Param-stack the parallel path/omic twins — the decoder TransLayers
# (ref umeml_gan.py:300-301), their LayerNorms (ref :302-303), and the
# per-prototype explainers (ref :313-314) — into single vmapped modules
# applied to a [2, B, T, D] stack. Each twin pair runs identical
# architecture on identically-shaped inputs, so every op in the pair
# becomes ONE op on a doubled leading dim: same FLOPs, half the thunks
# (the head is dispatch-bound, ~30 us/op — BASELINE.md r3 corollary).
# Per-slice numerics are exact (vmap is a parallel dim); only the init
# rng folds differ from the two-module layout. Changes the param tree
# (pair_decoder/pair_norm/pair_explainer vs the per-twin names).
# OPT-IN, default False: the step-time win is ~2% (interleaved A/B,
# BASELINE.md r3), but a 9-run matched-pairs quality study at the GAN-on
# reduced-scale protocol read -2.7 +- 6.7 C-index points vs the twin
# layout — inconclusive under the +-6 fold/seed noise, and not worth
# risking the quality-parity contract for 0.25 ms/step. Flip to True to
# trade that risk for the dispatch savings (and expect pair_* checkpoint
# keys).
STACKED_PAIRS = False

# TransLayer twins stacked over a leading axis: params get a leading
# dim of 2 (independent init draws per slice), dropout rngs split per
# slice (independent masks, matching two separate modules).
_StackedTransLayer = nn.vmap(
    TransLayer,
    in_axes=(0, None, None),
    out_axes=0,
    variable_axes={"params": 0},
    split_rngs={"params": True, "dropout": True},
)
_StackedLayerNorm = nn.vmap(
    nn.LayerNorm,
    in_axes=0,
    out_axes=0,
    variable_axes={"params": 0},
    split_rngs={"params": True},
)
_StackedLinear = nn.vmap(
    TorchLinear,
    in_axes=0,
    out_axes=0,
    variable_axes={"params": 0},
    split_rngs={"params": True},
)


def _bce_with_logits_vs_ones(z: jnp.ndarray) -> jnp.ndarray:
    """BCEWithLogits(z, 1) = softplus(-z).  The reference applies this to the
    discriminator's *sigmoid output* (``adversarial_loss``, ref ``:371-372``)
    — reproduced faithfully."""
    return jnp.mean(jax.nn.softplus(-z))


def _bce(p: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    p = jnp.clip(p, eps, 1.0 - eps)
    return -jnp.mean(y * jnp.log(p) + (1.0 - y) * jnp.log(1.0 - p))


class UMEML_GAN(nn.Module):
    num_classes: int
    gene_group_indexes: Tuple[Tuple[int, ...], ...]
    hidden: int = 256
    n_proto: int = 6
    n_reg: int = 3
    dropout_rate: float = 0.25
    fusion: str = "concat"
    lambda_cyc: float = 10.0
    topk: int = 3
    kd_t: float = 5.0
    proto_initializer: object = None  # None -> uniform reset() init
    # sequence parallelism: when set, batch["img"]/["img_mask"] arrive as
    # token shards over this mesh axis (run under shard_map); the bag
    # cross-attention and the modularity loss use the collective variants
    sp_axis: object = None  # Optional[str]
    # TPU.SP_ATTENTION: how the modularity loss spans the sharded bag.
    # "gather" all-gathers the normalized bag once ([B, N, D] per device);
    # "ring" streams column chunks via ppermute — nothing of size N ever
    # materializes on one device, so 100k-patch bags fit. The prototype
    # cross-attention is distributed-softmax (O(N/sp)) in BOTH modes.
    sp_mode: str = "gather"

    def setup(self):
        assert len(self.gene_group_indexes) == self.n_proto, (
            f"MODEL.UMEML.PROTOTYPES ({self.n_proto}) must equal the number "
            f"of gene groups ({len(self.gene_group_indexes)}) — one omics "
            "encoder per prototype (ref umeml_gan.py:274-283)"
        )
        hidden = self.hidden
        tokens = self.n_proto + 1

        self.gan_generator_p2o = Generator(tokens=tokens, dim=hidden)
        self.gan_generator_o2p = Generator(tokens=tokens, dim=hidden)
        self.gan_discriminator_o = Discriminator()
        self.gan_discriminator_p = Discriminator()

        self.drop = nn.Dropout(self.dropout_rate)
        self.path_net = TorchLinear(hidden)
        # the 6 per-group omics encoders run as ONE batched einsum
        # (GroupedLinear) instead of the reference's Python loop of tiny
        # matmuls — same numerics, one MXU dispatch
        self.omic_net = GroupedLinear(
            group_sizes=tuple(len(g) for g in self.gene_group_indexes),
            features=hidden,
        )
        self.proto_g_blocks = [
            PathProtoGenerator(dim=hidden, seq_axis=self.sp_axis)
            for _ in range(2)
        ]
        self.omic_encoder = [Block(dim=hidden) for _ in range(2)]
        if STACKED_PAIRS:
            self.pair_decoder = _StackedTransLayer(dim=hidden)
            self.pair_norm = _StackedLayerNorm(epsilon=1e-5)
        else:
            self.layer_norm_p = nn.LayerNorm(epsilon=1e-5)
            self.layer_norm_o = nn.LayerNorm(epsilon=1e-5)
            self.path_decoder = TransLayer(dim=hidden)
            self.omic_decoder = TransLayer(dim=hidden)
        self.bottleattn = BottleneckAttentionBlock(
            dim=hidden,
            n_reg=self.n_reg,
            use_pairing=True,
            topk=self.topk,
        )
        initializer = self.proto_initializer or proto_init(self.n_proto)
        self.p_proto = self.param(
            "p_proto", initializer, (1, self.n_proto, hidden)
        )
        self.p_encoder_token = self.param(
            "p_encoder_token", uniform01, (1, 1, hidden)
        )
        self.o_encoder_token = self.param(
            "o_encoder_token", uniform01, (1, 1, hidden)
        )

        if self.fusion == "concat":
            self.mm_fc1 = TorchLinear(hidden)
            self.mm_fc2 = TorchLinear(hidden)
        elif self.fusion == "bilinear":
            self.mm = BilinearFusion(
                dim1=hidden, dim2=hidden, scale_dim1=8, scale_dim2=8, mmhid=hidden
            )
        else:
            raise ValueError(f"Unknown fusion: {self.fusion}")
        self.classifier = TorchLinear(self.num_classes)
        if STACKED_PAIRS:
            self.pair_explainer = _StackedLinear(self.num_classes, use_bias=False)
        else:
            self.explainer_path = TorchLinear(self.num_classes, use_bias=False)
            self.explainer_omic = TorchLinear(self.num_classes, use_bias=False)

    # ------------------------------------------------------------------ #
    # encoder: bag + omics -> normalized token sequences                  #
    # ------------------------------------------------------------------ #
    def encode(self, batch: Dict, train: bool = False) -> Dict:
        det = not train
        x_path = batch["img"]
        mask = batch.get("img_mask")
        x_omic = batch["mol"]  # [B, G]
        b = x_path.shape[0]

        # in-sample omics deletion -> train-mean imputation (ref :391-392)
        insample = batch.get("insample_without_omic")
        if insample is not None and "omic_means" in batch:
            x_omic = jnp.where(
                insample.astype(bool), batch["omic_means"][None, :], x_omic
            )

        h = self.path_net(x_path)
        if BAG_DTYPE is not None:
            # cast in the matmul epilogue: every materialized bag-sized
            # tensor downstream (relu, dropout, mask-mult, attention K/V)
            # is stored/read at half the bytes
            h = h.astype(BAG_DTYPE)
        h = nn.relu(h)
        if self.sp_axis is not None and not det:
            # distinct dropout mask per token shard = one consistent global
            # mask over the sharded bag (the data-axis index is folded into
            # the rng by the trainer before it reaches the model, so masks
            # are also independent across data shards)
            h_path_bag = self.drop(
                h,
                deterministic=det,
                rng=jax.random.fold_in(
                    self.make_rng("dropout"), jax.lax.axis_index(self.sp_axis)
                ),
            )
        else:
            h_path_bag = self.drop(h, deterministic=det)
        if mask is not None:
            h_path_bag = h_path_bag * mask[..., None]

        # gather all gene groups into one zero-padded [B, K, Gmax] tensor;
        # pad inputs are zeroed so pad kernel rows never see a gradient
        gmax = max(len(g) for g in self.gene_group_indexes)
        pad_idx = np.zeros((self.n_proto, gmax), np.int32)
        pad_valid = np.zeros((self.n_proto, gmax), np.float32)
        for k, idx in enumerate(self.gene_group_indexes):
            pad_idx[k, : len(idx)] = idx
            pad_valid[k, : len(idx)] = 1.0
        xg = x_omic[:, pad_idx] * pad_valid[None]  # [B, K, Gmax]
        hg = nn.relu(self.omic_net(xg))
        h_omic_bag = self.drop(hg, deterministic=det)  # [B, n_proto, D]

        p_proto = jnp.tile(self.p_proto, (b, 1, 1))
        for blk in self.proto_g_blocks:
            p_proto = blk(h_path_bag, p_proto, key_valid=mask, deterministic=det)
        p_proto_before = p_proto
        h_omic_bag_before = h_omic_bag

        h_omic = jnp.concatenate(
            [jnp.tile(self.o_encoder_token, (b, 1, 1)), h_omic_bag], axis=1
        )
        for blk in self.omic_encoder:
            h_omic = blk(h_omic, deterministic=det)
        h_path = jnp.concatenate(
            [jnp.tile(self.p_encoder_token, (b, 1, 1)), p_proto], axis=1
        )
        if STACKED_PAIRS:
            # both twins are [B, n_proto+1, D]: run decoder + LN as ONE
            # vmapped call over the [2, B, T, D] stack
            h2 = jnp.stack([h_path, h_omic])
            h2 = self.pair_decoder(h2, None, det)
            h2 = self.pair_norm(h2)
            h_path, h_omic = h2[0], h2[1]
        else:
            h_path = self.path_decoder(h_path, deterministic=det)
            h_omic = self.omic_decoder(h_omic, deterministic=det)
            h_path = self.layer_norm_p(h_path)
            h_omic = self.layer_norm_o(h_omic)
        return {
            "h_path": h_path,
            "h_omic": h_omic,
            "p_proto": p_proto,
            "p_proto_before": p_proto_before,
            "h_omic_bag_before": h_omic_bag_before,
            "h_path_bag": h_path_bag,
        }

    # ------------------------------------------------------------------ #
    # GAN pieces (trainer differentiates these wrt their partitions)      #
    # ------------------------------------------------------------------ #
    def gen_p2o(self, h_path):
        return self.gan_generator_p2o(h_path)

    def gen_o2p(self, h_omic):
        return self.gan_generator_o2p(h_omic)

    def gen_loss(self, h_path, h_omic):
        """Adversarial + cycle loss (ref ``:461-471``); inputs detached."""
        h_path = jax.lax.stop_gradient(h_path)
        h_omic = jax.lax.stop_gradient(h_omic)
        fake_omic = self.gan_generator_p2o(h_path)
        fake_path = self.gan_generator_o2p(h_omic)
        cycle_path = self.gan_generator_o2p(fake_omic)
        cycle_omic = self.gan_generator_p2o(fake_path)
        gan_p2o = _bce_with_logits_vs_ones(self.gan_discriminator_o(fake_omic))
        gan_o2p = _bce_with_logits_vs_ones(self.gan_discriminator_p(fake_path))
        cyc_o = jnp.mean(jnp.abs(cycle_omic - h_omic))
        cyc_p = jnp.mean(jnp.abs(cycle_path - h_path))
        return (gan_p2o + gan_o2p) + self.lambda_cyc * (cyc_o + cyc_p)

    def dis_p_loss(self, h_path, h_omic):
        """Pathology discriminator BCE (ref ``:476-482``); generator frozen."""
        h_path = jax.lax.stop_gradient(h_path)
        h_omic = jax.lax.stop_gradient(h_omic)
        fake_path = jax.lax.stop_gradient(self.gan_generator_o2p(h_omic))
        pred = jnp.concatenate(
            [self.gan_discriminator_p(h_path), self.gan_discriminator_p(fake_path)],
            axis=0,
        )
        labels = jnp.concatenate(
            [jnp.ones((h_path.shape[0], 1)), jnp.zeros((h_path.shape[0], 1))], axis=0
        )
        return _bce(pred, labels)

    def dis_o_loss(self, h_path, h_omic):
        """Omics discriminator BCE (ref ``:484-490``)."""
        h_path = jax.lax.stop_gradient(h_path)
        h_omic = jax.lax.stop_gradient(h_omic)
        fake_omic = jax.lax.stop_gradient(self.gan_generator_p2o(h_path))
        pred = jnp.concatenate(
            [self.gan_discriminator_o(h_omic), self.gan_discriminator_o(fake_omic)],
            axis=0,
        )
        labels = jnp.concatenate(
            [jnp.ones((h_omic.shape[0], 1)), jnp.zeros((h_omic.shape[0], 1))], axis=0
        )
        return _bce(pred, labels)

    # ------------------------------------------------------------------ #
    # bottleneck + fusion + explainer head                                 #
    # ------------------------------------------------------------------ #
    def _fuse(self, t_path, t_omic, det: bool):
        if self.fusion == "bilinear":
            return self.mm(t_path[:, 0], t_omic[:, 0], deterministic=det)
        z = jnp.concatenate([t_path[:, 0], t_omic[:, 0]], axis=1)
        z = nn.relu(self.mm_fc1(z))
        return nn.relu(self.mm_fc2(z))

    def head(self, h_path, h_omic, train: bool = False, T: float = 5.0) -> Dict:
        det = not train
        b, n_tokens, _ = h_path.shape

        # per-prototype explainer + self-distillation (ref :554-598).
        # Computed FIRST so that (when HEAD_FUSED) both bottleneck passes
        # can run as one batched call — see the flag comment at the top.
        if STACKED_PAIRS:
            both = self.pair_explainer(jnp.stack([h_path, h_omic]))
            logits_path_proto, logits_omic_proto = both[0], both[1]  # [B, P, C]
        else:
            logits_path_proto = self.explainer_path(h_path)  # [B, P, C]
            logits_omic_proto = self.explainer_omic(h_omic)
        logits_path = logits_path_proto.mean(axis=1)
        logits_omic = logits_omic_proto.mean(axis=1)
        logits_explained = (logits_path + logits_omic) / 2.0
        pred_class = logits_explained.argmax(axis=1)  # [B]
        imp_path = jnp.take_along_axis(
            logits_path_proto, pred_class[:, None, None], axis=2
        )[..., 0]
        imp_omic = jnp.take_along_axis(
            logits_omic_proto, pred_class[:, None, None], axis=2
        )[..., 0]
        imp_path_disp = transform_importance(imp_path)[:, : n_tokens - 1]
        imp_omic_disp = transform_importance(imp_omic)[:, : n_tokens - 1]

        w_path = transform_importance_to_half_one_point_five(
            jax.lax.stop_gradient(imp_path)
        )[..., None]
        w_omic = transform_importance_to_half_one_point_five(
            jax.lax.stop_gradient(imp_omic)
        )[..., None]
        if HEAD_FUSED:
            hp2 = jnp.concatenate([h_path, h_path * w_path], axis=0)
            ho2 = jnp.concatenate([h_omic, h_omic * w_omic], axis=0)
            t_path, _, t_omic, _ = self.bottleattn(hp2, ho2, deterministic=det)
            logits_both = self.classifier(self._fuse(t_path, t_omic, det))
            logits1 = logits_both[:b]  # plain first pass (ref :532-543)
            logits = logits_both[b:]  # importance-scaled final logits
        else:
            # two sequential passes, as the reference executes them
            t_path, _, t_omic, _ = self.bottleattn(
                h_path, h_omic, deterministic=det
            )
            logits1 = self.classifier(self._fuse(t_path, t_omic, det))
            t_path2, _, t_omic2, _ = self.bottleattn(
                h_path * w_path, h_omic * w_omic, deterministic=det
            )
            logits = self.classifier(self._fuse(t_path2, t_omic2, det))
        loss_kd = kd_loss_fn(logits_explained, logits1, T=T)

        return {
            "logits": logits,
            "logits_first_pass": logits1,
            "loss_kd": loss_kd,
            "importance_path": imp_path_disp,
            "importance_omic": imp_omic_disp,
        }

    # ------------------------------------------------------------------ #
    # full forward (main loss path / eval path)                            #
    # ------------------------------------------------------------------ #
    def __call__(
        self,
        batch: Dict,
        train: bool = False,
        replace_ratio: float = 0.0,
        cca: bool = False,
    ) -> Dict:
        enc = self.encode(batch, train=train)
        return self.finish(
            enc, batch, train=train, replace_ratio=replace_ratio, cca=cca
        )

    def finish(
        self,
        enc: Dict,
        batch: Dict,
        train: bool = False,
        replace_ratio: float = 0.0,
        cca: bool = False,
    ) -> Dict:
        """Everything after :meth:`encode` (replacement, missing-omics
        generation, head, modularity).  Split out so the trainer can run ONE
        encode forward (``jax.vjp``) shared by the GAN phase and the main
        loss — the reference computes a single forward too (its GAN step
        happens inside it, ref ``umeml_gan.py:461-490``)."""
        h_path, h_omic = enc["h_path"], enc["h_omic"]

        if cca:
            return {
                "h_path": h_path,
                "h_omic": h_omic,
                "p_proto_before": enc["p_proto_before"],
                "h_omic_bag_before": enc["h_omic_bag_before"],
            }

        # one generator pass serves both the progressive replacement and the
        # missing-omics generation below: the reference calls gen_p2o(h_path)
        # twice on the SAME h_path (ref :492-497 then :499-511) — identical
        # computations, computed once here
        h_omic_gen = self.gan_generator_p2o(h_path)

        if train:
            # progressive replacement by generated omics (ref :492-497;
            # note the reference replaces when uniform > ratio)
            rng = self.make_rng("gan")
            u = jax.random.uniform(rng, (h_omic.shape[0],))
            ratio = jnp.asarray(replace_ratio)
            do_replace = (u > ratio) & (ratio > 0)
            h_omic = jnp.where(do_replace[:, None, None], h_omic_gen, h_omic)

        # generation for missing omics (ref :499-511)
        without = batch.get("without_omic")
        if without is not None:
            h_omic = jnp.where(
                without.astype(bool)[:, None, None], h_omic_gen, h_omic
            )
        insample = batch.get("insample_without_omic")
        if insample is not None:
            gen_ratio = jnp.mean(insample.astype(h_omic.dtype))
            h_omic = (1.0 - gen_ratio) * h_omic + gen_ratio * h_omic_gen

        out = self.head(h_path, h_omic, train=train, T=self.kd_t)

        modular_loss = jnp.zeros(())
        if train:
            mask = batch.get("img_mask")
            if self.sp_axis is not None:
                from ..parallel.sequence import (
                    compute_modularity_pair_ring,
                    compute_modularity_pair_sp,
                )

                pair_fn = (
                    compute_modularity_pair_ring
                    if self.sp_mode == "ring"
                    else compute_modularity_pair_sp
                )
                modular_loss = pair_fn(
                    (enc["p_proto"], h_omic), enc["h_path_bag"],
                    valid_local=mask, axis_name=self.sp_axis,
                )
            else:
                modular_loss = compute_modularity_pair(
                    (enc["p_proto"], h_omic), enc["h_path_bag"], valid=mask
                )
        out["modular_loss"] = modular_loss
        out["h_path"] = h_path
        out["h_omic"] = h_omic
        return out

    def init_all(self, batch: Dict) -> None:
        """Touch every submodule so ``init`` creates all params."""
        out = self(batch, train=True, replace_ratio=0.1)
        enc_h_path, enc_h_omic = out["h_path"], out["h_omic"]
        _ = self.gen_loss(enc_h_path, enc_h_omic)
        _ = self.dis_p_loss(enc_h_path, enc_h_omic)
        _ = self.dis_o_loss(enc_h_path, enc_h_omic)
