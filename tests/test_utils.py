

def test_model_submodules_not_shadowed_by_factories():
    """Round-5 regression guard: the registered factory functions must not
    shadow their submodules in the package namespace — `import
    imp_tpu.models.umeml_gan as ug` has to bind the MODULE, or
    attribute-style flag writes (ab_step knobs, BAG_DTYPE/HEAD_FUSED
    pokes) silently no-op (the r3 head_fused A/B was lost to this)."""
    import sys
    import types

    import imp_tpu.models  # noqa: F401 — registers the factories

    for name in ("umeml_gan", "umeml", "clipomic"):
        mod = sys.modules.get(f"imp_tpu.models.{name}")
        if mod is None:
            continue  # lazily imported submodule not loaded yet
        attr = getattr(__import__("imp_tpu.models", fromlist=[name]), name)
        assert isinstance(attr, types.ModuleType), (
            f"imp_tpu.models.{name} resolves to {type(attr)} — a package "
            f"attribute is shadowing the submodule"
        )
