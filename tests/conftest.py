"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is validated
on host-platform virtual devices (the driver separately dry-runs the
multi-chip path via __graft_entry__.dryrun_multichip).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the image pre-sets axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize imports jax at interpreter start with JAX_PLATFORMS=axon, so
# the env var alone is too late — override through the config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def small_graph(rng, n=50, e=200, multi_edges=False):
    """A small random graph fixture (deduped unless multi_edges)."""
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = rng.integers(0, n, size=e).astype(np.int32)
    keep = senders != receivers
    senders, receivers = senders[keep], receivers[keep]
    if not multi_edges:
        pairs = np.unique(np.stack([senders, receivers], 1), axis=0)
        senders, receivers = pairs[:, 0], pairs[:, 1]
    return senders, receivers
