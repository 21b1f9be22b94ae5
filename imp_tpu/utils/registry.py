"""Name -> factory registries.

Same role as the reference's ``medmm/utils/registry.py:7-69`` (Dassl-style
Registry) so that the reference's YAML config names keep working, but it is
just a dict of factories — no metaclass machinery.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable


class Registry:
    """A registry mapping names to factory callables."""

    def __init__(self, name: str):
        self._name = name
        self._obj_map: Dict[str, Callable] = {}

    def _do_register(self, name: str, obj: Callable, force: bool = False) -> None:
        if name in self._obj_map and not force:
            raise KeyError(
                f"An object named '{name}' was already registered in '{self._name}' registry"
            )
        self._obj_map[name] = obj

    def register(self, obj: Callable = None, force: bool = False):
        if obj is None:
            # used as a decorator
            def deco(fn_or_class: Callable) -> Callable:
                self._do_register(fn_or_class.__name__, fn_or_class, force=force)
                return fn_or_class

            return deco
        # used as a function call
        self._do_register(obj.__name__, obj, force=force)
        return obj

    def register_as(self, name: str, force: bool = False):
        """Register under an explicit name (e.g. lowercase config aliases)."""

        def deco(fn_or_class: Callable) -> Callable:
            self._do_register(name, fn_or_class, force=force)
            return fn_or_class

        return deco

    def get(self, name: str) -> Callable:
        if name not in self._obj_map:
            raise KeyError(
                f"Object name '{name}' does not exist in '{self._name}' registry. "
                f"Available: {sorted(self._obj_map)}"
            )
        return self._obj_map[name]

    def registered_names(self) -> Iterable[str]:
        return sorted(self._obj_map.keys())

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map


def check_availability(requested: str, available: Iterable[str]) -> None:
    """Raise with a did-you-mean message when a config name is unknown.

    Mirrors reference ``medmm/utils/tools.py:211-224``.
    """
    available = list(available)
    if requested in available:
        return
    import difflib

    close = difflib.get_close_matches(requested, available)
    hint = f" Did you mean: {close}?" if close else ""
    raise ValueError(
        f"'{requested}' is not available. Choose from {sorted(available)}.{hint}"
    )
