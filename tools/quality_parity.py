"""5-fold quality-parity experiment: imp_tpu vs the reference torch code.

Trains UMEML_GAN on IDENTICAL synthetic folds with identical
hyperparameters twice per fold — once with the imp_tpu MBTRAIN trainer
(jax), once with a faithful replica of the reference engine's training
loop driving the reference's own torch model (imported from
/root/reference as a black box, GAN curriculum off: loss = task + kd +
modularity, Adam with coupled L2, the same cosine/warmup schedule via
``lr_at_epoch``) — and compares final test C-indexes per fold.

Both sides read batches through the same ``SlideDataset``/``EpochLoader``
(same seeded shuffle -> identical batch order) and score with the same
``Survival_UMEML`` evaluator, so the only differences are framework
numerics, dropout draws, and init draws. Known documented deviation:
our p_proto is trainable (paper intent); the reference's is a frozen
plain tensor (PARITY.md deviation #6).

Usage: python tools/quality_parity.py [--epochs 8] [--folds 5]
Writes a markdown table to stdout (paste into BASELINE.md).
"""

import argparse
import os
import os.path as osp
import shutil
import sys
import types

_HERE = osp.dirname(osp.abspath(__file__))
sys.path.insert(0, osp.join(_HERE, ".."))

import numpy as np

REF = "/root/reference"
SENTINEL = -10000.0


def install_ref_stubs(hidden, n_proto):
    """Stub the reference's unavailable deps (timm/torchvision/ftfy/regex/
    PLIP downloader) — same recipe as tests/test_umeml_gan_parity.py."""
    import torch

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    timm_layers.DropPath = DropPath
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)

    tv = types.ModuleType("torchvision")
    tv_tr = types.ModuleType("torchvision.transforms")
    for name in ("Compose", "Resize", "CenterCrop", "ToTensor", "Normalize"):
        setattr(tv_tr, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
    tv_tr.InterpolationMode = type("IM", (), {"BICUBIC": 3})
    tv.transforms = tv_tr
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_tr)

    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    sys.modules.setdefault("ftfy", ftfy)
    import re as _re

    regex = types.ModuleType("regex")
    regex.IGNORECASE = _re.IGNORECASE
    regex.compile = lambda *a, **k: None
    regex.findall = lambda *a, **k: []
    sys.modules.setdefault("regex", regex)

    plip_stub = types.ModuleType("extract_prototype_with_plip_train")
    plip_stub.get_path_prorotypes = (
        lambda: torch.zeros(1, n_proto, hidden)
    )
    sys.modules["extract_prototype_with_plip_train"] = plip_stub

    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self

    if REF not in sys.path:
        sys.path.insert(0, REF)


def torch_cca_epoch(model, dm, to_torch, cca_lr=1e-3, threshold=64):
    """Replica of the reference CCA alignment epoch
    (``/root/reference/medmm/engine/trainer.py:672-739``): accumulate
    (h_path, h_omic, similarity-MSE batch loss) over <=64 batches, then one
    Adam(1e-3) step over ALL model params on
    ``cca_loss(cat(h_path), cat(h_omic)) + mean(batch_loss)``.  The Adam is
    created fresh each epoch exactly as the reference does (``:682``).
    ``cca_loss`` (``trainer.py:46-58``) and the similarity-MSE branch
    (``mbtrain.py:190-199,491-493``) are transcribed torch formulas."""
    import torch
    import torch.nn.functional as F

    def ref_cca_loss(X, Y, epsilon=1e-8):
        Xc = X - X.mean(0)
        Yc = Y - Y.mean(0)
        Xs = Xc / Xc.std(0, unbiased=False)
        Ys = Yc / Yc.std(0, unbiased=False)
        C_xy = Xs.T @ Ys / (X.size(0) - 1)
        u, s, v = torch.svd(C_xy)
        return 1 / (s.sum() / s.numel() + epsilon)

    def cosine_similarity_matrix(m):
        return m / m.norm(p=2, dim=1, keepdim=True)

    model.cca = True
    model.train()
    cca_opt = torch.optim.Adam(model.parameters(), lr=cca_lr)
    hp_l, ho_l, bl_l = [], [], []
    nb = len(dm.train_loader)
    for bi, batch in enumerate(dm.train_loader):
        out = model(to_torch(batch))
        # (h_path, h_omic, p_proto_before, h_omic_bag_before, 'cca')
        h_path, h_omic, p_b, h_b = out[0], out[1], out[2], out[3]
        pf = p_b.reshape(p_b.shape[0], -1)
        hf = h_b.reshape(h_b.shape[0], -1)
        p_sim = cosine_similarity_matrix(pf @ pf.T)
        h_sim = cosine_similarity_matrix(hf @ hf.T)
        bl = F.mse_loss(p_sim, h_sim)
        hp_l.append(h_path.reshape(h_path.shape[0], -1))
        ho_l.append(h_omic.reshape(h_omic.shape[0], -1))
        bl_l.append(bl)
        if bi == nb - 1 or len(hp_l) == threshold:
            cca_opt.zero_grad()
            loss = ref_cca_loss(torch.cat(hp_l), torch.cat(ho_l)) + torch.stack(
                bl_l
            ).mean()
            loss.backward()
            cca_opt.step()
            hp_l, ho_l, bl_l = [], [], []
    model.cca = False


def make_cfg(root, out_dir, fold, epochs, hidden, batch,
             gan_start=None, replace_start=None, cca=False,
             bag_pad=64, feat_dim=32):
    from imp_tpu.config import get_cfg_default

    cfg = get_cfg_default()
    cfg.OUTPUT_DIR = out_dir
    cfg.SEED = 1
    cfg.DATASET.ROOT = root
    cfg.DATASET.NAME = "TCGA_Glioma_S_UMEML"
    cfg.DATASET.FEATURE_NAME = "features_clip_vit_b16"
    cfg.DATASET.FOLD = fold
    cfg.DATASET.BAG_PAD = bag_pad
    cfg.DATASET.PATH.DIM = feat_dim
    cfg.TASK.NAME = "Survival"
    cfg.TASK.LOSS = "nllsurvloss_new"
    cfg.TEST.EVALUATOR = "Survival_UMEML"
    cfg.DATALOADER.TRAIN.BATCH_SIZE = batch
    cfg.DATALOADER.TEST.BATCH_SIZE = batch
    cfg.OPTIM.MAX_EPOCH = epochs
    cfg.OPTIM.LR = 2e-4
    cfg.OPTIM.LR_SCHEDULER = "cosine"
    cfg.OPTIM.WARMUP_EPOCH = 1
    cfg.TRAIN.PRINT_FREQ = 1000
    cfg.MODEL.NAME = "umeml_gan"
    cfg.MODEL.HIDDEN_DIM = hidden
    cfg.MODEL.PROJECT_DIM = hidden
    cfg.MODEL.FUSION = "concat"
    cfg.MODEL.UMEML.PROTOTYPES = 6
    cfg.MODEL.UMEML.REGISTERS = 3
    cfg.TRAINER.NAME = "MBTRAIN"
    # GAN curriculum off by default, on when gan_start/replace_start given;
    # CCA alignment epochs on when --cca (torch side runs torch_cca_epoch)
    cfg.TRAIN.CURRICULUM.GAN_START_EPOCH = (
        gan_start if gan_start is not None else epochs + 1
    )
    cfg.TRAIN.CURRICULUM.REPLACE_START_EPOCH = (
        replace_start if replace_start is not None else epochs + 1
    )
    cfg.TRAIN.CURRICULUM.CCA_EVERY_EPOCH = bool(cca)
    cfg.TPU.PREFETCH = 0
    return cfg


def run_jax_fold(cfg):
    from imp_tpu.engine import build_trainer

    # a stale OUTPUT_DIR resumes from leftover checkpoints and corrupts
    # the comparison — always start the fold fresh
    if osp.isdir(cfg.OUTPUT_DIR):
        shutil.rmtree(cfg.OUTPUT_DIR)
    trainer = build_trainer(cfg)
    return float(trainer.train())


def run_torch_fold(cfg, work):
    """Replica of reference MBTRAIN.forward_backward for the non-GAN,
    non-BSM Survival branch (ref engine/mbtrain.py:152-189: loss =
    nllsurvloss_new + loss_kd + 1 * modular_loss), torch Adam with
    coupled L2 (ref optim), lr set per epoch from our oracle-tested
    ``lr_at_epoch``."""
    import torch

    from imp_tpu.data import DataManager
    from imp_tpu.evaluation import build_evaluator
    from imp_tpu.optim.builders import lr_at_epoch

    # DATASET files the ref model reads at construction, from OUR synthetic
    ds_dir = osp.join(work, "DATASET", "tcga_glioma")
    os.makedirs(osp.join(ds_dir, "labels"), exist_ok=True)
    os.makedirs(osp.join(ds_dir, "molecular"), exist_ok=True)
    root = osp.abspath(osp.expanduser(cfg.DATASET.ROOT))
    shutil.copy(
        osp.join(root, "tcga_glioma", "labels", "signatures.csv"),
        osp.join(ds_dir, "labels", "signatures.csv"),
    )
    dm = DataManager(cfg)
    mol0 = dm.dataset.train[0].molpath
    shutil.copy(mol0, osp.join(ds_dir, "molecular", "TCGA-02-0047-01A-01-BS1.csv"))

    old_cwd = os.getcwd()
    os.chdir(work)
    try:
        from medmm.modeling.models.umeml_gan import UMEML_GAN as RefModel
        from medmm.loss.loss import NLLSurvLoss_NEW

        torch.manual_seed(cfg.SEED)
        omic_dim = dm.omic_dim
        cfg.DATASET.OMIC.DIM = omic_dim  # ref reshapes x_omic by this
        model = RefModel(cfg=cfg, num_classes=dm.num_classes, omic_sizes=omic_dim)
        model.g_omic_net[0] = torch.nn.Linear(omic_dim, cfg.MODEL.HIDDEN_DIM)
        # the reference hardcodes omic_input_dims=[82,330,513,440,1538,451]
        # (umeml_gan.py:274) — resize each per-group Linear to the actual
        # group dims of this dataset (same unblocking as g_omic_net)
        for i, g in enumerate(dm.omic_sizes):
            model.omic_net[i][0] = torch.nn.Linear(g, cfg.MODEL.HIDDEN_DIM)
        model = model.float()
        model.cca = False
        model.train_gan = False
        model.replace_ratio = 0
        assert [len(g) for g in model.gene_group_indexes] == dm.omic_sizes

        loss_fn = NLLSurvLoss_NEW(alpha=0.0)
        opt = torch.optim.Adam(
            model.parameters(),
            lr=cfg.OPTIM.LR,
            weight_decay=cfg.OPTIM.WEIGHT_DECAY,
        )

        def to_torch(batch):
            img = batch["img"].copy()
            mask = batch["img_mask"]
            img[~mask] = SENTINEL  # ref strips sentinel rows per sample
            return {
                "img": torch.tensor(img),
                "omic": torch.tensor(batch["mol"]),
                "patient_id": list(batch["patient_id"]),
            }

        cur = cfg.TRAIN.CURRICULUM
        for epoch in range(cfg.OPTIM.MAX_EPOCH):
            lr = lr_at_epoch(cfg.OPTIM, epoch)
            for g in opt.param_groups:
                g["lr"] = lr
            # same curriculum gates as MBTRAIN.train (mbtrain.py:549-557):
            # GAN phase from GAN_START_EPOCH, replacement ramp after
            if epoch < cur.GAN_START_EPOCH:
                model.train_gan, model.replace_ratio = False, 0.0
            elif epoch < cur.REPLACE_START_EPOCH:
                model.train_gan, model.replace_ratio = True, 0.0
            else:
                rs = cur.REPLACE_START_EPOCH
                model.train_gan = True
                model.replace_ratio = (
                    (epoch + 1 - rs) / (cfg.OPTIM.MAX_EPOCH + 1 - rs) / 2
                )
            model.train()
            dm.train_loader.set_epoch(epoch)
            for batch in dm.train_loader:
                out = model(to_torch(batch))
                loss = loss_fn(
                    logits=out,
                    Y=torch.tensor(np.asarray(batch["label"], np.int64)),
                    c=torch.tensor(np.asarray(batch["censorship"])),
                )
                loss = loss + out[-2] + 1.0 * out[1]  # kd + modularity
                opt.zero_grad()
                loss.backward()
                opt.step()
            # CCA alignment epoch after every non-final epoch, mirroring
            # MBTRAIN.train (the reference runs it inside TrainerBase.train,
            # ref trainer.py:294-304)
            if (
                cur.CCA_EVERY_EPOCH
                and epoch < cfg.OPTIM.MAX_EPOCH - 1
            ):
                # the jax side iterates the SAME epoch's loader order again
                dm.train_loader.set_epoch(epoch)
                torch_cca_epoch(
                    model, dm, to_torch,
                    cca_lr=float(cur.CCA_LR),
                    threshold=int(cur.CCA_ACCUM_BATCHES),
                )

        model.eval()
        evaluator = build_evaluator(cfg)
        evaluator.reset()
        with torch.no_grad():
            for batch in dm.test_loader:
                logits = model(to_torch(batch))
                evaluator.process(
                    batch["patient_id"],
                    logits.numpy(),
                    batch["censorship"],
                    batch["survival_month"],
                )
        results = evaluator.evaluate()
        return float(list(results.values())[0])
    finally:
        os.chdir(old_cwd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/qp_data")
    ap.add_argument("--work", default="/tmp/qp_work")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--slides", type=int, default=48)
    ap.add_argument("--cpu", action="store_true",
                    help="force the jax side onto CPU (leave the TPU free)")
    ap.add_argument("--gan-start", type=int, default=None,
                    help="GAN phase start epoch on BOTH sides (default off)")
    ap.add_argument("--replace-start", type=int, default=None,
                    help="replacement-ramp start epoch (default off)")
    ap.add_argument("--cca", action="store_true",
                    help="run the CCA alignment epoch after every non-final "
                         "epoch on BOTH sides (ref trainer.py:672-739)")
    # canonical-scale knobs (VERDICT r2 item 7: one fold at the shipped
    # configuration — hidden 256, bag 10k, batch 2, feat 512)
    ap.add_argument("--bag-min", type=int, default=16)
    ap.add_argument("--bag-max", type=int, default=48)
    ap.add_argument("--bag-pad", type=int, default=64)
    ap.add_argument("--feat-dim", type=int, default=32)
    ap.add_argument("--genes", type=int, default=120)
    ap.add_argument("--group-size", type=int, default=15)
    ap.add_argument("--start-fold", type=int, default=1)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from imp_tpu.data import synthetic

    if not osp.isdir(osp.join(args.root, "tcga_glioma")):
        synthetic.materialize(
            args.root, num_slides=args.slides, bag_min=args.bag_min,
            bag_max=args.bag_max, feat_dim=args.feat_dim,
            num_genes=args.genes, group_size=args.group_size, seed=0,
        )

    install_ref_stubs(args.hidden, 6)
    os.makedirs(args.work, exist_ok=True)

    import json

    results_path = osp.join(args.work, "results.jsonl")
    done = {}
    if osp.exists(results_path):
        with open(results_path) as f:
            for line in f:
                r = json.loads(line)
                done[r["fold"]] = (r["jax"], r["ref"])

    rows = []
    for fold in range(args.start_fold, args.start_fold + args.folds):
        if fold in done:
            c_jax, c_ref = done[fold]
        else:
            cfg = make_cfg(
                args.root, osp.join(args.work, f"jax_f{fold}"), fold,
                args.epochs, args.hidden, args.batch,
                gan_start=args.gan_start, replace_start=args.replace_start,
                cca=args.cca, bag_pad=args.bag_pad, feat_dim=args.feat_dim,
            )
            c_jax = run_jax_fold(cfg)
            c_ref = run_torch_fold(cfg, args.work)
            with open(results_path, "a") as f:
                f.write(json.dumps({"fold": fold, "jax": c_jax, "ref": c_ref}) + "\n")
        rows.append((fold, c_jax, c_ref))
        print(f"fold {fold}: imp_tpu={c_jax:.4f}  reference={c_ref:.4f}  "
              f"delta={c_jax - c_ref:+.4f}", flush=True)

    j = np.array([r[1] for r in rows])
    r = np.array([r[2] for r in rows])
    print("\n| fold | imp_tpu C-index | reference C-index | delta |")
    print("|---|---|---|---|")
    for fold, cj, cr in rows:
        print(f"| {fold} | {cj:.4f} | {cr:.4f} | {cj - cr:+.4f} |")
    print(f"| **mean±sd** | {j.mean():.4f}±{j.std():.4f} "
          f"| {r.mean():.4f}±{r.std():.4f} | {np.abs(j - r).mean():.4f} (mean abs) |")


if __name__ == "__main__":
    main()
