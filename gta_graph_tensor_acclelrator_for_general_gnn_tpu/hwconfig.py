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
import functools
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class HwConfig:
    vmem_budget_bytes: int = 16 * 2**20
    vmem_regions: Tuple[float, float, float] = (1.0, 0.5, 0.5)  # W, N, E
    tile_palette: Optional[Tuple[tuple, ...]] = None   # None = built-in
    hbm_gbps: float = 819.0
    # interconnect bandwidths for the scaling model (parallel/scaling.py):
    # per-chip aggregate one-way ICI egress (v5e: 4 links x ~45 GB/s on the
    # 2-D torus — public "How to Scale Your Model" v5e numbers) and
    # per-host DCN egress (~200 Gbps NIC class)
    ici_gbps: float = 180.0
    dcn_gbps: float = 25.0

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

    def max_tile(self, feat_width: int, dtype_bytes: int = 4):
        """Largest square onehot tile feasible under the VMEM budget and
        region caps — the reference's buffer-maximal tile (its
        binary_search under the 2 MB buffer, compiler.py:67-131)."""
        from .compiler import schedule as S
        best = None
        n = 128
        while True:
            tc = S.TileConfig(n, n, min(n, 1024))
            if not S.tile_is_feasible(tc, feat_width, self.vmem_budget_bytes,
                                      dtype_bytes):
                break
            best = tc
            n *= 2
        return best

    def derived_palette(self, feat_width: int, dtype_bytes: int = 4):
        """Palette derived from the buffer-maximal tile: scale sweep
        {1, .5, .25} of the max square plus rectangular variants (the
        reference sweeps tile scale factors relative to the maximal tile,
        code/enumeration.py:93-99) plus the hybrid/stream entries.  Falls
        back to the static palette when even 128^2 does not fit."""
        from .compiler import schedule as S
        mx = self.max_tile(feat_width, dtype_bytes)
        if mx is None:
            return self.palette()
        seen, out = set(), []

        def add(br, bc, te, path=S.PATH_ONEHOT):
            br, bc, te = max(br, 128), max(bc, 128), max(te, 128)
            tc = S.TileConfig(br, bc, te, path)
            if tc.key() not in seen and S.tile_is_feasible(
                    tc, feat_width, self.vmem_budget_bytes, dtype_bytes):
                seen.add(tc.key())
                out.append(tc)

        m = mx.block_rows
        for scale in (1.0, 0.5, 0.25):
            n = max(int(m * scale) // 128 * 128, 128)
            add(n, n, min(n, 1024))
            add(n, n, min(n // 2, 1024))
        add(m // 2, m, min(m, 1024))        # wide-C (gather-heavy shapes)
        add(m, m // 2, min(m, 1024))        # wide-R
        for tc in self.palette():
            if tc.path != S.PATH_ONEHOT:
                out.append(tc)
        return tuple(out)


def load_hw_config(path: Optional[str] = None) -> HwConfig:
    """Read the config file (JSON; YAML when pyyaml is available).  With no
    path and no ``GTA_HW_CONFIG`` env var, returns defaults.  Parsed
    configs are cached per path — feasibility checks call this per tile
    per candidate schedule (thousands of times per tune)."""
    path = path or os.environ.get("GTA_HW_CONFIG")
    if not path:
        return HwConfig()
    return _load_hw_config_cached(path)


@functools.lru_cache(maxsize=16)
def _load_hw_config_cached(path: str) -> HwConfig:
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
    if "ici_gbps" in data:
        kw["ici_gbps"] = float(data["ici_gbps"])
    if "dcn_gbps" in data:
        kw["dcn_gbps"] = float(data["dcn_gbps"])
    return HwConfig(**kw)
