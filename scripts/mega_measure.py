import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler import schedule as S
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.fusion import lower_schedule
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import init_params
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.utils.benchmark import time_layer_device

ds = gta.load_dataset("cora")
for name, (iw, ow, heads) in {
    "layer3 (64->16, H16)": (64, 16, 16),
    "layer128 (128->128, H4)": (128, 128, 4),
}.items():
    og = gta.build_op_graph("GAT", iw, ow, heads=heads, layer_tag=f"m{iw}")
    params = jax.device_put(init_params(og, jax.random.key(0)))
    x = jax.device_put(jax.random.normal(jax.random.key(1), (ds.host_graph.n_node, iw), jnp.float32))
    part = S.layer_partition(og)
    assert part is not None and len(part) == 1, part
    for tc in (S.TileConfig(512, 512, 512), S.TileConfig(1024, 1024, 1024)):
        fn = lower_schedule(og, S.Schedule(blocks=part, tiles=(tc,)),
                            ds.host_graph, jnp.bfloat16)
        t = time_layer_device(fn, params, ds.graph, x,
                              k_small=100, k_big=3100, reps=3)
        print(f"MEGA {name} tc={tc.block_rows}x{tc.block_cols}x{tc.tile_edges}: {t*1e6:8.1f}us", flush=True)
