"""YAML op-graph round-trip in the reference schema."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gta_graph_tensor_acclelrator_for_general_gnn_tpu as gta
from gta_graph_tensor_acclelrator_for_general_gnn_tpu import ir_io
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.compiler.lower import (
    init_params, lower)
from gta_graph_tensor_acclelrator_for_general_gnn_tpu.models.builders import NETWORKS

from conftest import small_graph


@pytest.mark.parametrize("network", NETWORKS)
def test_roundtrip_preserves_numerics(rng, network):
    og = gta.build_op_graph(network, 16, 8, heads=2)
    text = ir_io.to_yaml(og, n_node=50, n_edge=200)
    back = ir_io.from_yaml(text, name=og.name, in_width=16)

    s, r = small_graph(rng, n=50, e=200)
    g = gta.build_graph(s, r, 50, add_self_loops=True, symmetric_norm=True)
    x = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    params = init_params(og, jax.random.key(0))
    out1 = lower(og)(params, g, x)
    out2 = lower(back)(params, g, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-6, atol=1e-6)


def test_reference_schema_fields():
    og = gta.build_op_graph("GCN", 8, 4)
    import yaml
    raw = yaml.safe_load(ir_io.to_yaml(og, n_node=10, n_edge=30))
    for d in raw:
        assert {"OP_NO", "COMP_TYPE", "TYPE", "ORDER", "INPUT", "OUTPUT"} <= set(d)
        assert d["TYPE"] in ("scatter", "gather", "applyedge", "applynode")
        assert d["INPUT"]["input_size"] % 4 == 0  # byte sizes


def test_import_plain_reference_file_without_extra(tmp_path):
    """A file with no EXTRA key (like the reference's own) still imports."""
    og = gta.build_op_graph("GCN", 8, 4)
    import yaml
    raw = yaml.safe_load(ir_io.to_yaml(og, n_node=10, n_edge=30))
    for d in raw:
        d.pop("EXTRA", None)
    p = tmp_path / "gcn.yaml"
    p.write_text(yaml.safe_dump(raw))
    back = ir_io.load(str(p), in_width=8)
    assert len(back.ops) == len(og.ops)
    # MM weight synthesised
    mm = [o for o in back.ops if o.compute == "MM"][0]
    assert "weight" in mm.extra
