"""String -> constructor registry.

Replaces the reference's config-named dynamic file loading
(`imp.load_source` in make_dataset/make_network/make_renderer/make_trainer/
make_evaluator/make_visualizer, see SURVEY.md §1 "Plugin architecture") with an
explicit registry: implementations register under a short name and configs pick
them by name.
"""

from __future__ import annotations

from typing import Callable, Dict


class Registry:
    def __init__(self, kind: str):
        self.kind = kind
        self._entries: Dict[str, Callable] = {}

    def register(self, name: str):
        def deco(fn):
            if name in self._entries:
                raise KeyError(f"{self.kind} {name!r} already registered")
            self._entries[name] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable:
        if name not in self._entries:
            raise KeyError(
                f"Unknown {self.kind} {name!r}; known: {sorted(self._entries)}"
            )
        return self._entries[name]

    def __contains__(self, name: str) -> bool:
        return name in self._entries


DATASETS = Registry("dataset")
NETWORKS = Registry("network")
RENDERERS = Registry("renderer")
TRAINERS = Registry("trainer")
EVALUATORS = Registry("evaluator")
VISUALIZERS = Registry("visualizer")
