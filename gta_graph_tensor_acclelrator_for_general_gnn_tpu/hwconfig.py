"""External hardware/tuning configuration (the reference's
``hardware_info.yaml`` — vTCAD/code/hardware_info.yaml:1-6 carries buffer
size, PE parallelism and bandwidth; its fusion-pattern table :11-69 maps to
the kernel pattern matchers here).

A JSON/YAML file (path via ``GTA_HW_CONFIG`` env var or
:func:`load_hw_config`) overrides the built-in defaults:

    vmem_budget_bytes:  Pallas VMEM feasibility bound (reference: 2 MB
                        Buffer_Size; TPU default ~16 MB)
    vmem_regions:       fractional caps {weight, node, edge} of the budget
                        (reference isFlexibleBuffer W .75/N .5/E .5,
                        compiler.py:73-75,95-99)
    tile_palette:       list of [block_rows, block_cols, tile_edges, path]
                        entries swept by the tuner
    hbm_gbps:           bandwidth used by analytic cost reports

Everything falls back to measured-good v5e defaults when no file is given.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class HwConfig:
    vmem_budget_bytes: int = 16 * 2**20
    vmem_regions: Tuple[float, float, float] = (1.0, 0.5, 0.5)  # W, N, E
    tile_palette: Optional[Tuple[tuple, ...]] = None   # None = built-in
    hbm_gbps: float = 819.0

    def palette(self):
        from .compiler import schedule as S
        from .tune.search import TILE_PALETTE
        if self.tile_palette is None:
            return TILE_PALETTE
        out = []
        for entry in self.tile_palette:
            br, bc, te = int(entry[0]), int(entry[1]), int(entry[2])
            path = entry[3] if len(entry) > 3 else S.PATH_ONEHOT
            out.append(S.TileConfig(br, bc, te, path))
        return tuple(out)


def load_hw_config(path: Optional[str] = None) -> HwConfig:
    """Read the config file (JSON; YAML when pyyaml is available).  With no
    path and no ``GTA_HW_CONFIG`` env var, returns defaults."""
    path = path or os.environ.get("GTA_HW_CONFIG")
    if not path:
        return HwConfig()
    with open(path) as f:
        text = f.read()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        import yaml
        data = yaml.safe_load(text)
    kw: Dict = {}
    if "vmem_budget_bytes" in data:
        kw["vmem_budget_bytes"] = int(data["vmem_budget_bytes"])
    if "vmem_regions" in data:
        r = data["vmem_regions"]
        kw["vmem_regions"] = (float(r.get("weight", 1.0)),
                              float(r.get("node", 0.5)),
                              float(r.get("edge", 0.5))) \
            if isinstance(r, dict) else tuple(float(v) for v in r)
    if "tile_palette" in data:
        kw["tile_palette"] = tuple(tuple(e) for e in data["tile_palette"])
    if "hbm_gbps" in data:
        kw["hbm_gbps"] = float(data["hbm_gbps"])
    return HwConfig(**kw)
