"""Name -> class registries (config keys select modules/losses).

Semantic rebuild of `net_utils/registry.py:6-48` + `models/registers.py`:
the yaml `model.<submodule>.method` / `.loss` strings resolve through
these tables, so reference configs drop in unchanged.
"""

from __future__ import annotations


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._map: dict[str, type] = {}

    def register(self, cls=None, *, name: str | None = None):
        def deco(c):
            self._map[name or c.__name__] = c
            return c

        if cls is None:
            return deco
        return deco(cls)

    def get(self, name: str):
        if name not in self._map:
            raise KeyError(
                f"{self.name} registry has no '{name}' "
                f"(known: {sorted(self._map)})"
            )
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map


METHODS = Registry("method")
MODULES = Registry("module")
LOSSES = Registry("loss")


def _populate() -> None:
    from .models import (
        ISCNet,
        ONet,
        Pointnet2Backbone,
        ProposalModule,
        SkipPropagation,
        VotingModule,
    )
    from .models import losses as L

    METHODS.register(ISCNet, name="ISCNet")
    MODULES.register(Pointnet2Backbone, name="Pointnet2Backbone")
    MODULES.register(VotingModule, name="VotingModule")
    MODULES.register(ProposalModule, name="ProposalModule")
    MODULES.register(SkipPropagation, name="SkipPropagation")
    MODULES.register(ONet, name="ONet")
    LOSSES.register(L.detection_loss, name="DetectionLoss")
    LOSSES.register(L.onet_loss, name="ONet_Loss")
    LOSSES.register(L.chamfer_loss, name="ChamferDist")
    LOSSES.register(L.boxnet_detection_loss, name="BoxNetDetectionLoss")


_populate()
