"""Default config tree.

Key-compatible with the reference's yacs schema
(``medmm/config/defaults.py:1-267``) so the reference's YAML files under
``configs/{Task}/{Method}.yaml`` load unchanged, plus a ``TPU`` subtree for
the TPU-native knobs (mesh axes, precision policy, bag padding, attention
implementation) that have no reference counterpart.
"""

from .node import CfgNode as CN


def get_cfg_default() -> CN:
    _C = CN()
    _C.VERSION = 1
    _C.OUTPUT_DIR = "./output"
    _C.RESUME = ""
    _C.SEED = -1
    _C.USE_CUDA = True  # accepted for config-compat; ignored (device = TPU/CPU via JAX)
    _C.VERBOSE = True

    # ---------------- Input (kept for config-file compatibility) ----------
    _C.INPUT = CN()
    _C.INPUT.SIZE = (224, 224)
    _C.INPUT.INTERPOLATION = "bilinear"
    _C.INPUT.TRANSFORMS = ()
    _C.INPUT.NO_TRANSFORM = False
    _C.INPUT.PIXEL_MEAN = [0.485, 0.456, 0.406]
    _C.INPUT.PIXEL_STD = [0.229, 0.224, 0.225]
    _C.INPUT.CROP_PADDING = 4
    _C.INPUT.RRCROP_SCALE = (0.08, 1.0)
    _C.INPUT.CUTOUT_N = 1
    _C.INPUT.CUTOUT_LEN = 16
    _C.INPUT.GN_MEAN = 0.0
    _C.INPUT.GN_STD = 0.15
    _C.INPUT.RANDAUGMENT_N = 2
    _C.INPUT.RANDAUGMENT_M = 10
    _C.INPUT.COLORJITTER_B = 0.4
    _C.INPUT.COLORJITTER_C = 0.4
    _C.INPUT.COLORJITTER_S = 0.4
    _C.INPUT.COLORJITTER_H = 0.1
    _C.INPUT.RGS_P = 0.2
    _C.INPUT.GB_P = 0.5
    _C.INPUT.GB_K = 21

    # ---------------- Dataset ---------------------------------------------
    _C.DATASET = CN()
    _C.DATASET.ROOT = ""
    _C.DATASET.MODALITY = "multimodal"
    _C.DATASET.NAME = "blca"
    _C.DATASET.TYPE = "Survival"
    _C.DATASET.FOLD = 0
    _C.DATASET.SURVIVAL_ENDPOINT = "DSS"
    _C.DATASET.USE_BSM = False  # bag micro-chunking (ref mbtrain.py:21-47)
    _C.DATASET.BS_MICRO = 512
    _C.DATASET.SCPATH = False
    _C.DATASET.CLUSTER_PATH = "./datasets/kmeans_label"
    _C.DATASET.OMIC = CN()
    _C.DATASET.OMIC.TYPE = "group"
    _C.DATASET.OMIC.PATHWAY = "combine"
    _C.DATASET.OMIC.DIM = 4999
    _C.DATASET.PATH = CN()
    _C.DATASET.PATH.FEATURE = "ctranspath"
    _C.DATASET.PATH.SAMPLE = True
    _C.DATASET.PATH.NUM = 4096
    _C.DATASET.PATH.DIM = 1024
    _C.DATASET.FEATURE_NAME = "features_r50"
    # TPU additions: fixed-shape bag padding with a boolean mask replaces the
    # reference's -10000 sentinel pad-to-10000 (ref data_manager.py:356-367).
    _C.DATASET.BAG_PAD = 10000  # static padded bag length
    _C.DATASET.H5_KEY = "clip_vit_b32_feature"  # ref data_manager.py:374
    _C.DATASET.SIGNATURES = ""  # path to signatures.csv (gene groups); "" = DATASET/ROOT default
    _C.DATASET.SYNTHETIC = CN()  # in-memory synthetic dataset for tests/bench
    _C.DATASET.SYNTHETIC.ENABLE = False
    _C.DATASET.SYNTHETIC.NUM_TRAIN = 16
    _C.DATASET.SYNTHETIC.NUM_VAL = 8
    _C.DATASET.SYNTHETIC.BAG_MIN = 64
    _C.DATASET.SYNTHETIC.BAG_MAX = 256

    # ---------------- Task --------------------------------------------------
    _C.TASK = CN()
    _C.TASK.NAME = "Survival"
    _C.TASK.LOSS = "celoss"
    _C.TASK.INSTANCE_LOSS = "svmloss"

    # ---------------- Dataloader --------------------------------------------
    _C.DATALOADER = CN()
    _C.DATALOADER.NUM_WORKERS = 4
    _C.DATALOADER.CACHE = True  # in-memory bag cache (fits: bags are features)
    _C.DATALOADER.CACHE_GB = 8.0  # host bag-cache budget in GiB (LRU eviction)
    # slides longer than DATASET.BAG_PAD: "truncate" keeps the first
    # BAG_PAD patches; "sample" keeps a seeded uniform subset in original
    # order (the reference instead micro-chunks through ALL patches —
    # split_chunk, mbtrain.py:21-47 — which needs dynamic shapes; a static
    # pad with sampling is the TPU-honest equivalent)
    _C.DATALOADER.BAG_OVERFLOW = "truncate"
    _C.DATALOADER.DEVICE_CACHE = True  # device-resident bag cache (single-chip
    # meshes; upload each slide once instead of re-transferring every epoch)
    _C.DATALOADER.K_TRANSFORMS = 1
    _C.DATALOADER.RETURN_IMG0 = False
    _C.DATALOADER.TRAIN = CN()
    _C.DATALOADER.TRAIN.SAMPLER = "RandomSampler"
    _C.DATALOADER.TRAIN.BATCH_SIZE = 1
    _C.DATALOADER.TEST = CN()
    _C.DATALOADER.TEST.SAMPLER = "SequentialSampler"
    _C.DATALOADER.TEST.BATCH_SIZE = 1

    # ---------------- Model --------------------------------------------------
    _C.MODEL = CN()
    _C.MODEL.INIT_WEIGHTS = ""
    _C.MODEL.NETWORK = CN()
    _C.MODEL.NETWORK.NAME = ""
    _C.MODEL.BACKBONE = CN()
    _C.MODEL.BACKBONE.NAME = ""
    _C.MODEL.BACKBONE.CLIP = "ViT-B/16"
    _C.MODEL.BACKBONE.PRETRAINED = True
    # path to an OpenAI CLIP torch state_dict for CLIPOMIC's frozen text
    # tower ("" = random init; the reference downloads it,
    # ref engine/clipomic.py:18-33)
    _C.MODEL.BACKBONE.CLIP_CHECKPOINT = ""
    # CLIPOMIC text-tower architecture (defaults = CLIP ViT-B text config;
    # shrink for tests)
    _C.MODEL.BACKBONE.TEXT_WIDTH = 512
    _C.MODEL.BACKBONE.TEXT_HEADS = 8
    _C.MODEL.BACKBONE.TEXT_LAYERS = 12
    _C.MODEL.BACKBONE.TEXT_VOCAB = 49408
    _C.MODEL.BACKBONE.TEXT_CONTEXT = 77
    _C.MODEL.MIL = CN()
    _C.MODEL.MIL.NAME = ""
    _C.MODEL.NAME = "abmil"
    # MODEL.FUSION is a plain value (string or None) so UMEML configs can set
    # 'concat'/'bilinear' directly — same quirk as ref defaults.py:141-144.
    _C.MODEL.FUSION = None
    _C.MODEL.SIZE = "small"
    _C.MODEL.PATH1 = 8
    _C.MODEL.PATH2 = 16
    _C.MODEL.DROPOUT = 0.1
    _C.MODEL.HIDDEN_DIM = 256
    _C.MODEL.PROJECT_DIM = 256
    _C.MODEL.OT_REG = 0.25
    _C.MODEL.OT_TAU = 0.5
    _C.MODEL.OT_IMPL = "pot-uot-l2"
    _C.MODEL.CLAM_TYPE = "SB"
    _C.MODEL.K_SAMPLE = 10
    _C.MODEL.SUBTYPING = False
    _C.MODEL.GATE = False
    _C.MODEL.NUM_CLUSTERS = 10
    _C.MODEL.NUM_HEADS = 1
    _C.MODEL.UMEML = CN()
    _C.MODEL.UMEML.PROTOTYPES = 5
    _C.MODEL.UMEML.REGISTERS = 3
    _C.MODEL.UMEML.ALPHA = 5.0
    _C.MODEL.UMEML.TOPK = 3  # greedy path<->omic pairing K (ref umeml_gan.py:120)
    _C.MODEL.UMEML.G_OMIC_DIM = 1000  # global-omics branch input width (ref umeml_gan.py:285)
    _C.MODEL.UMEML.KD_T = 5.0  # self-distillation temperature (ref umeml_gan.py:374)
    _C.MODEL.UMEML.LAMBDA_CYC = 10.0  # CycleGAN cycle weight (ref umeml_gan.py:333)
    _C.MODEL.UMEML.GAN_LR = 1e-4  # internal GAN Adam lr (ref umeml_gan.py:247-249)
    _C.MODEL.UMEML.GAN_WD = 1e-4
    _C.MODEL.UMEML.PROTO_INIT = "uniform"  # "uniform" (ref reset() quirk) | "plip"
    _C.MODEL.HEAD = CN()
    _C.MODEL.HEAD.NAME = ""
    _C.MODEL.HEAD.HIDDEN_LAYERS = ()
    _C.MODEL.HEAD.ACTIVATION = "relu"
    _C.MODEL.HEAD.BN = True
    _C.MODEL.HEAD.DROPOUT = 0.0

    # ---------------- Loss ----------------------------------------------------
    _C.LOSS = CN()
    _C.LOSS.ALPHA = 0.5
    _C.LOSS.REDUCTION = "mean"
    _C.LOSS.CMTA_ALPHA = 1.0
    _C.LOSS.BAG_WEIGHT = 0.3

    # ---------------- Optimization ---------------------------------------------
    _C.OPTIM = CN()
    _C.OPTIM.NAME = "adam"
    _C.OPTIM.LR = 0.0003
    _C.OPTIM.WEIGHT_DECAY = 5e-4
    _C.OPTIM.MOMENTUM = 0.9
    _C.OPTIM.SGD_DAMPNING = 0
    _C.OPTIM.SGD_NESTEROV = False
    _C.OPTIM.RMSPROP_ALPHA = 0.99
    _C.OPTIM.ADAM_BETA1 = 0.9
    _C.OPTIM.ADAM_BETA2 = 0.999
    _C.OPTIM.STAGED_LR = False
    _C.OPTIM.NEW_LAYERS = ()
    _C.OPTIM.BASE_LR_MULT = 0.1
    _C.OPTIM.LR_SCHEDULER = "single_step"
    _C.OPTIM.STEPSIZE = (-1,)
    _C.OPTIM.GAMMA = 0.1
    _C.OPTIM.MAX_EPOCH = 10
    _C.OPTIM.WARMUP_EPOCH = -1
    _C.OPTIM.WARMUP_TYPE = "linear"
    _C.OPTIM.WARMUP_CONS_LR = 1e-5
    _C.OPTIM.WARMUP_MIN_LR = 1e-5
    _C.OPTIM.WARMUP_RECOUNT = True
    _C.OPTIM.GRAD_ACCUM = 1  # gradient accumulation steps (ref mcat.py:175-193 uses 32)

    # ---------------- Train / Test -----------------------------------------------
    _C.TRAIN = CN()
    _C.TRAIN.CHECKPOINT_FREQ = 0
    _C.TRAIN.PRINT_FREQ = 10
    _C.TRAIN.COUNT_ITER = "train"
    # Declarative GAN/CCA curriculum (the reference hardcodes this into
    # TrainerBase.train, ref engine/trainer.py:294-304).
    _C.TRAIN.CURRICULUM = CN()
    _C.TRAIN.CURRICULUM.ENABLE = True  # only consulted by UMEML_GAN trainer
    _C.TRAIN.CURRICULUM.GAN_START_EPOCH = 3
    _C.TRAIN.CURRICULUM.REPLACE_START_EPOCH = 5
    _C.TRAIN.CURRICULUM.CCA_EVERY_EPOCH = True
    _C.TRAIN.CURRICULUM.CCA_ACCUM_BATCHES = 64  # ref trainer.py:688
    _C.TRAIN.CURRICULUM.CCA_LR = 1e-3  # ref trainer.py:682
    # Apply dropout in the CCA alignment forward (the reference keeps the
    # model in train() mode during run_epoch_cca, ref trainer.py:691 — True
    # matches that).  False runs the CCA forward deterministically; measured
    # to stabilise the alignment epoch on some rng streams (BASELINE.md,
    # round-3 CCA study) while leaving the estimator's fixed point unchanged.
    _C.TRAIN.CURRICULUM.CCA_DROPOUT = True

    _C.TEST = CN()
    _C.TEST.EVALUATOR = "Classification"
    _C.TEST.PER_CLASS_RESULT = False
    _C.TEST.COMPUTE_CMAT = False
    _C.TEST.NO_TEST = False
    _C.TEST.SPLIT = "test"
    _C.TEST.FINAL_MODEL = "last_step"

    # ---------------- Trainer -------------------------------------------------
    _C.TRAINER = CN()
    _C.TRAINER.NAME = ""
    _C.TRAINER.PREC = "fp32"  # "fp32" | "bf16" ("fp16"/"amp" accepted -> bf16 on TPU)

    # ---------------- TPU-native additions -------------------------------------
    _C.TPU = CN()
    _C.TPU.MESH_AXES = ("data",)  # mesh axis names
    _C.TPU.MESH_SHAPE = (-1,)  # -1 = all available devices on that axis
    _C.TPU.ATTENTION = "auto"  # "auto" | "dense" | "nystrom" | "flash"
    # sequence-parallel layout for TransLayer-family models on a "seq" axis:
    # "gather" = seq-replicated module IO (all-gather-KV bands, O(N)/device);
    # "ring"   = shard-in/shard-out ring attention + halo convs, O(N/sp)
    #            per-device activations (100k-patch bags; needs square BAG_PAD)
    _C.TPU.SP_ATTENTION = "gather"
    _C.TPU.DONATE = True  # donate train-state buffers to the jitted step
    _C.TPU.REMAT = False  # jax.checkpoint the bag encoder
    _C.TPU.PROFILE_DIR = ""  # jax.profiler trace dir ("" = off)
    _C.TPU.DEBUG_NANS = False  # jax.config debug_nans (ref detect_anomaly parity)
    _C.TPU.PREFETCH = 2  # device-prefetch depth of the input pipeline
    # "msgpack" (flax, reference-like single files) | "orbax" (tensorstore
    # directories; collective sharded writes on multi-host pods). Readers
    # auto-detect per checkpoint, so the knob only affects writes.
    _C.TPU.CHECKPOINT_BACKEND = "msgpack"

    return _C


def clean_cfg(cfg: CN, trainer: str) -> None:
    """Remove trainer-irrelevant subtrees (reference ``config/__init__.py:8-21``)."""
    # kept as a no-op hook for CLI parity; our config is small enough to keep.
    _ = (cfg, trainer)
