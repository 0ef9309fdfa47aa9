"""Native (C++) preprocessing must match the numpy paths exactly."""
import numpy as np
import pytest

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu import native
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import tile_graph

from conftest import small_graph

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE,
                                reason="native lib unavailable")


def test_sort_by_receiver_matches_numpy(rng):
    r = rng.integers(0, 500, size=4000).astype(np.int32)
    order_n = native.sort_by_receiver_native(r, 500)
    order_np = np.argsort(r, kind="stable")
    np.testing.assert_array_equal(order_n, order_np)


def test_degrees_match_numpy(rng):
    s = rng.integers(0, 300, size=2000).astype(np.int32)
    r = rng.integers(0, 300, size=2000).astype(np.int32)
    out_deg, in_deg = native.degrees_native(s, r, 300)
    ref_in = np.bincount(r, minlength=300).astype(np.float64)
    ref_out = np.bincount(s, minlength=300).astype(np.float64)
    np.testing.assert_array_equal(in_deg, ref_in)
    np.testing.assert_array_equal(out_deg, ref_out)


def test_native_tiling_identical_to_numpy(rng, monkeypatch):
    s, r = small_graph(rng, n=300, e=2500, multi_edges=True)
    hg = gta.build_host_graph(s, r, 300, add_self_loops=True,
                              symmetric_norm=True)
    tg_native = tile_graph(hg, block_rows=64, block_cols=64, tile_edges=128)
    monkeypatch.setattr(native, "HAVE_NATIVE", False)
    tg_numpy = tile_graph(hg, block_rows=64, block_cols=64, tile_edges=128)
    for field in ("tile_rb", "tile_cb", "src_local", "dst_local",
                  "edge_id", "weight", "row_first_tile"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tg_native, field)),
            np.asarray(getattr(tg_numpy, field)), err_msg=field)
