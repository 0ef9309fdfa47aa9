import sys; sys.path.insert(0, "/root/repo")
"""On-hardware kernel parity: every Pallas kernel compiled by Mosaic on the
real chip, allclose vs the XLA oracle (interpret-mode tests cannot catch a
Mosaic-vs-interpret divergence — VERDICT r1 weak #7).

Exit code != 0 on any failure; prints one PASS/FAIL line per kernel.
Numerics involve device->host readbacks, which flip the axon tunnel into
slow mode — run this SEPARATELY from timing (bench.py runs first in CI
order).
"""
import numpy as np
import jax
import jax.numpy as jnp

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu import ir
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    build_host_graph, hybrid_graph, tile_graph)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
    dense as D, primitives as P, sddmm as SD, spmm as SP)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
    gat_attention)

rng = np.random.default_rng(0)
n, e = 600, 4000
s = rng.integers(0, n, e).astype(np.int32)
r = rng.integers(0, n, e).astype(np.int32)
keep = s != r
hg = build_host_graph(s[keep], r[keep], n, symmetric_norm=True,
                      edge_pad_multiple=512)
g = hg.to_device()
# unit-weight twin for the attention oracle (gat kernels ignore edge
# weights; the sym-norm g would make _gat_reference_g a WEIGHTED softmax)
import dataclasses as _dc
gu = _dc.replace(g, edge_weight=g.edge_mask.astype(jnp.float32))
tg = tile_graph(hg, block_rows=256, block_cols=256, tile_edges=512)
tgu = tile_graph(hg, block_rows=256, block_cols=256, tile_edges=512,
                 unit_weight=True)
hyb = hybrid_graph(hg, block_rows=128, block_cols=128, tile_edges=256,
                   min_nnz=180, unit_weight=True)
assert hyb.dense is not None and hyb.n_sparse_edges > 0

F, H = 64, 4
x = jax.device_put(jax.random.normal(jax.random.key(1), (n, F), jnp.float32))
a_s = jax.device_put(jax.random.normal(jax.random.key(2), (n, H), jnp.float32))
a_d = jax.device_put(jax.random.normal(jax.random.key(3), (n, H), jnp.float32))

failures = []


def check(name, got, want, tol):
    got, want = np.asarray(got), np.asarray(want)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    ok = err < tol and np.isfinite(got).all()
    print(f"{'PASS' if ok else 'FAIL'} {name}: rel_err={err:.2e}", flush=True)
    if not ok:
        failures.append(name)


# oracle values (XLA on the same chip)
ew = P.scatter_to_edges(x, g, "C") * g.edge_weight[:, None]
y_ref = jax.jit(lambda: P.gather_to_nodes(ew, g, ir.ADD))()

check("spmm/f32", jax.jit(lambda: SP.spmm(tg, x))(), y_ref, 1e-5)
check("spmm/bf16", jax.jit(lambda: SP.spmm(tg, x.astype(jnp.bfloat16)))(),
      y_ref, 2e-2)
check("spmm_hybrid/f32", jax.jit(
    lambda: D.spmm_hybrid(hyb, g,
                          x)[: n])(),
      jax.jit(lambda: P.gather_to_nodes(
          P.scatter_to_edges(x, g, "C") * g.edge_mask[:, None].astype(
              jnp.float32), g, ir.ADD))(), 1e-4)

gat_ref = jax.jit(lambda: D._gat_reference_g(gu, x, a_s, a_d, 0.2))()
check("gat_chain/f32",
      jax.jit(lambda: gat_attention(tgu, x, a_s, a_d, heads=H))(),
      gat_ref, 1e-4)

# narrow (transposed-dataflow) orientation: HD + H <= NARROW_T
xn = x[:, :16]
a_sn = jax.device_put(jax.random.normal(jax.random.key(7), (n, 16),
                                        jnp.float32))
a_dn = jax.device_put(jax.random.normal(jax.random.key(8), (n, 16),
                                        jnp.float32))
gat_ref_n = jax.jit(lambda: D._gat_reference_g(gu, xn, a_sn, a_dn, 0.2))()
check("gat_chain_T/f32",
      jax.jit(lambda: gat_attention(tgu, xn, a_sn, a_dn, heads=16))(),
      gat_ref_n, 1e-4)
check("gat_chain_T/bf16",
      jax.jit(lambda: gat_attention(tgu, xn.astype(jnp.bfloat16),
                                    a_sn.astype(jnp.bfloat16),
                                    a_dn.astype(jnp.bfloat16), heads=16))(),
      gat_ref_n, 3e-2)
check("gat_chain/bf16",
      jax.jit(lambda: gat_attention(tgu, x.astype(jnp.bfloat16),
                                    a_s.astype(jnp.bfloat16),
                                    a_d.astype(jnp.bfloat16), heads=H))(),
      gat_ref, 3e-2)
check("gat_hybrid/f32",
      jax.jit(lambda: D.gat_hybrid(hyb, gu, x, a_s, a_d))(), gat_ref, 1e-4)

# r5 hybrid KERNEL backward (dense-block VJP kernels + fused tile-domain
# tail) vs autodiff of the XLA segment oracle, Mosaic-compiled
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    transpose_host_graph)
hg_T, _ = transpose_host_graph(hg)
hyb_bk = hybrid_graph(hg, block_rows=128, block_cols=128, tile_edges=256,
                      min_nnz=180, unit_weight=True, block_layout="cr")
hyb_bk_t = hybrid_graph(hg_T, block_rows=128, block_cols=128, tile_edges=256,
                        min_nnz=180, unit_weight=True, block_layout="cr")
gk_h, gk_s, gk_d = jax.jit(jax.grad(
    lambda hh, ss, dd: jnp.sum(D.gat_hybrid(
        hyb_bk, gu, hh, ss, dd, hyb_t=hyb_bk_t) ** 2),
    argnums=(0, 1, 2)))(x, a_s, a_d)
gr_h, gr_s, gr_d = jax.jit(jax.grad(
    lambda hh, ss, dd: jnp.sum(
        D._gat_reference_g(gu, hh, ss, dd, 0.2, weighted=False) ** 2),
    argnums=(0, 1, 2)))(x, a_s, a_d)
check("gat_hybrid_bwd_dh/f32", gk_h, gr_h, 1e-4)
check("gat_hybrid_bwd_das/f32", gk_s, gr_s, 1e-4)
check("gat_hybrid_bwd_dad/f32", gk_d, gr_d, 1e-4)

# derive (w_asrc) mode: in-kernel a_src + transposed tail + (dh, dw, dad)
w_hb = jax.device_put(
    jax.random.normal(jax.random.key(31), (F, H), jnp.float32) * 0.3)
gw_h, gw_w, gw_d = jax.jit(jax.grad(
    lambda hh, ww, dd: jnp.sum(D.gat_hybrid(
        hyb_bk, gu, hh, None, dd, hyb_t=hyb_bk_t, w_asrc=ww) ** 2),
    argnums=(0, 1, 2)))(x, w_hb, a_d)
# HIGHEST-precision a_src in the oracle: the kernel derives a_src at
# HIGHEST for f32, while a bare jnp.dot rounds through bf16 on TPU —
# comparing against the DEFAULT oracle measures logit-rounding noise
# (exp-amplified to ~0.4 max-rel), not kernel error
gwr_h, gwr_w, gwr_d = jax.jit(jax.grad(
    lambda hh, ww, dd: jnp.sum(D._gat_reference_g(
        gu, hh, jnp.dot(hh, ww, precision=jax.lax.Precision.HIGHEST),
        dd, 0.2, weighted=False) ** 2),
    argnums=(0, 1, 2)))(x, w_hb, a_d)
check("gat_hybrid_wmode_dh/f32", gw_h, gwr_h, 1e-4)
check("gat_hybrid_wmode_dw/f32", gw_w, gwr_w, 1e-4)
check("gat_hybrid_wmode_dad/f32", gw_d, gwr_d, 1e-4)

sd_ref = jax.jit(lambda: (P.scatter_to_edges(a_s, g, "C")
                          + P.scatter_to_edges(a_d, g, "R"))
                 * g.edge_mask[:, None].astype(jnp.float32))()
check("sddmm_edges/ADD",
      jax.jit(lambda: SD.sddmm_edges(tgu, g, a_s, a_d, "ADD"))(), sd_ref, 1e-5)

# chunked (stripe-split) dispatch — the >65k-tile SMEM path on real HW
check("spmm_chunked/f32",
      jax.jit(lambda: SP.spmm(tg, x, max_tiles_per_call=8))(), y_ref, 1e-5)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
    _gat_forward)
check("gat_chunked/f32",
      jax.jit(lambda: _gat_forward(tgu, x, a_s, a_d,
                                   max_tiles_per_call=8))(), gat_ref, 1e-4)

# int8 count blocks + separable degree scaling (spmm) and int8 mask (gat)
hyb8 = hybrid_graph(hg, block_rows=128, block_cols=128, tile_edges=256,
                    min_nnz=180, values_dtype=np.int8)
deg_in = np.bincount(hg.receivers[: hg.n_edge], minlength=n)
deg_out = np.bincount(hg.senders[: hg.n_edge], minlength=n)
rs_ = jax.device_put(jnp.asarray(1.0 / np.sqrt(np.maximum(deg_in, 1)),
                                 jnp.float32))
cs_ = jax.device_put(jnp.asarray(1.0 / np.sqrt(np.maximum(deg_out, 1)),
                                 jnp.float32))
check("spmm_int8_sep/f32",
      jax.jit(lambda: (D.spmm_dense(hyb8.dense, x, row_scale=rs_,
                                    col_scale=cs_)[: n]
                       + SP.spmm(hyb8.tiles, x)[: n]))(), y_ref, 1e-4)

# transposed ('cr' layout) dense attention kernel vs the wide hybrid
hyb_cr = hybrid_graph(hg, block_rows=128, block_cols=128, tile_edges=256,
                      min_nnz=180, unit_weight=True, values_dtype=np.int8,
                      block_layout="cr")
if hyb_cr.dense is not None:
    msrc_ = jnp.max(a_s, axis=0, keepdims=True)
    hyb_rc = hybrid_graph(hg, block_rows=128, block_cols=128, tile_edges=256,
                          min_nnz=180, unit_weight=True,
                          values_dtype=np.int8)
    check("gat_dense_T/f32",
          jax.jit(lambda: D.gat_dense_partial(hyb_cr.dense, x, a_s, a_d,
                                              msrc_))(),
          jax.jit(lambda: D.gat_dense_partial(hyb_rc.dense, x, a_s, a_d,
                                              msrc_))(), 1e-4)

# wide derive path: a_src derived in-kernel from w_asrc (width-128 repack)
w_a = jax.device_put(
    jax.random.normal(jax.random.key(9), (F, H), jnp.float32) * 0.3)
gat_ref_w = jax.jit(
    lambda: D._gat_reference_g(gu, x, jnp.dot(x, w_a), a_d, 0.2))()
check("gat_derive/f32",
      jax.jit(lambda: gat_attention(tgu, x, None, a_d, heads=H,
                                    w_asrc=w_a))(), gat_ref_w, 1e-4)
check("gat_derive/bf16",
      jax.jit(lambda: gat_attention(tgu, x.astype(jnp.bfloat16), None,
                                    a_d.astype(jnp.bfloat16), heads=H,
                                    w_asrc=w_a.astype(jnp.bfloat16)))(),
      gat_ref_w, 3e-2)

# transposed_derive at WIDE HD (the Reddit GAT tail default): feat rides
# the sublane axis, edge axis on the 128 lanes, a_src derived in-kernel
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
    _gat_forward)
check("gat_transposed_derive/bf16",
      jax.jit(lambda: _gat_forward(
          tgu, x.astype(jnp.bfloat16), None, a_d.astype(jnp.bfloat16),
          w_asrc=w_a.astype(jnp.bfloat16),
          dataflow="transposed_derive"))(),
      gat_ref_w, 3e-2)

# whole-layer mega-kernel with an in-kernel ELU activation: Mosaic has no
# expm1 lowering, so _sf_apply's elu must stick to exp/where primitives
# (caught live: zoo_bench GAT kernel-schedule crashed on hardware while
# every interpret-mode test passed)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops.gat import (
    _gat_layer_reference, gat_layer)
HD = 32
w_l = jax.device_put(
    jax.random.normal(jax.random.key(10), (F, HD), jnp.float32) * 0.3)
was_l = jax.device_put(
    jax.random.normal(jax.random.key(11), (HD, H), jnp.float32) * 0.3)
wad_l = jax.device_put(
    jax.random.normal(jax.random.key(12), (HD, H), jnp.float32) * 0.3)
check("gat_layer_elu/f32",
      jax.jit(lambda: gat_layer(tgu, x, w_l, was_l, wad_l,
                                final_sf="elu"))(),
      jax.jit(lambda: _gat_layer_reference(tgu, x, w_l, was_l, wad_l,
                                           0.2, "elu"))(), 1e-4)

# pair-sum aggregation (DGN/PNA fused chain: sum/max/mean in one pass)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
    pairagg as pair_mod)
u_pa = jax.device_put(
    jax.random.normal(jax.random.key(20), (n, F), jnp.float32))
v_pa = jax.device_put(
    jax.random.normal(jax.random.key(21), (n, F), jnp.float32))
ys_pa, ym_pa, cnt_pa = jax.jit(
    lambda: pair_mod.pair_aggregate_raw(tgu, u_pa, v_pa,
                                        sf="leaky_relu"))()
rs_pa, rm_pa, rc_pa = pair_mod._pair_agg_reference(
    tgu, u_pa, v_pa, sf="leaky_relu", slope=0.2)
check("pair_agg_sum/f32", ys_pa, rs_pa, 1e-4)
check("pair_agg_max/f32", ym_pa, rm_pa, 1e-4)
check("pair_agg_cnt/f32", cnt_pa, rc_pa, 1e-6)

# grouped stripe-chunk SpMM (the round-3 sparse-tail kernel)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.graph import (
    tile_graph_grouped)
tg_g = tile_graph_grouped(hg, block_rows=512, block_cols=512,
                          tile_edges=128, group=8)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
    spmm as spmm_g)
check("spmm_grouped/f32",
      jax.jit(lambda: spmm_g._spmm_grouped_raw(tg_g, x))(),
      spmm_g._spmm_grouped_reference(tg_g, x)[:n], 1e-4)

# r4 transposed grouped GAT chain (interleaved-repeat head expansion)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
    gat as gat_hw)
tg_gat = tile_graph_grouped(hg, block_rows=512, block_cols=512,
                            tile_edges=128, group=8, unit_weight=True)
H_g, HD_g = 4, F
h_g = jax.device_put(
    jax.random.normal(jax.random.key(22), (n, HD_g), jnp.float32))
wa_g = jax.device_put(
    jax.random.normal(jax.random.key(23), (HD_g, H_g), jnp.float32) * 0.2)
ad_g = jax.device_put(
    jax.random.normal(jax.random.key(24), (n, H_g), jnp.float32))
ms_g = jnp.max(h_g @ wa_g, axis=0, keepdims=True)
tgu_gat = tile_graph(hg, block_rows=512, block_cols=512, tile_edges=128,
                     unit_weight=True)
check("gat_grouped_t/f32",
      jax.jit(lambda: gat_hw._gat_forward(
          tg_gat, h_g, None, ad_g, w_asrc=wa_g, normalize=False,
          msrc=ms_g))(),
      gat_hw._gat_forward(tgu_gat, h_g, None, ad_g, w_asrc=wa_g,
                          normalize=False, msrc=ms_g, interpret=True,
                          dataflow="wide"), 1e-4)

# r4 transposed grouped SDDMM (x_dst materialised ONCE: recomputing a
# DEFAULT-precision matmul inside vs outside jit rounds differently
# through bf16 and shows up as a bogus 6e-4 input divergence)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import (
    sddmm as sddmm_hw)
xd_sg = jax.device_put(
    jax.random.normal(jax.random.key(25), (n, F), jnp.float32))
out_sg = np.asarray(jax.jit(lambda: sddmm_hw.sddmm(
    tg_gat, h_g, xd_sg, heads=4))())
ref_sg = np.asarray(sddmm_hw.sddmm(tg_gat, h_g, xd_sg, heads=4,
                                   interpret=True))
check("sddmm_grouped/f32", out_sg, ref_sg, 1e-4)

# sparse-input MM
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.ops import sinput
xs = (rng.random((n, 200)) < 0.03).astype(np.float32) * \
    rng.normal(size=(n, 200)).astype(np.float32)
fg = sinput.feature_graph(xs, block=128, tile_edges=256)
w = jax.device_put(jax.random.normal(jax.random.key(4), (200, F), jnp.float32))
check("sinput_mm/f32", jax.jit(lambda: sinput.sparse_input_mm(fg, w))(),
      xs @ np.asarray(w), 1e-4)

if failures:
    print(f"FAILED: {failures}")
    sys.exit(1)
print("ALL KERNELS PASS (Mosaic-compiled, real chip)")
