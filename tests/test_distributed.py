"""Multi-host smoke test: jax.distributed over N CPU processes.

The reference has no distributed fixture to copy (SURVEY.md §5.8); this is
the multi-process analogue of the virtual-mesh tests — two OS processes
form one global mesh and run the sharded XOR-hash and set-algebra steps
over process-spanning global arrays.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import sys
import numpy as np

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from kmerset_tpu.ops.count import SENTINEL
from kmerset_tpu.parallel.mesh import make_mesh, sharded_hash_fn, sharded_set_algebra_fn

mesh = make_mesh()
assert mesh.devices.size == nproc

# Deterministic global set, key-range sharded: process p holds rows of a
# (nproc, cap) layout.
cap = 256
rng = np.random.default_rng(0)
allk = np.unique(rng.integers(0, 1 << 20, 300)).astype(np.int64)
edges = np.linspace(0, 1 << 20, nproc + 1).astype(np.int64)
local = np.full(cap, SENTINEL, dtype=np.int64)
part = allk[(allk >= edges[pid]) & (allk < edges[pid + 1])]
local[: part.size] = part

sharding = NamedSharding(mesh, P("kv"))
garr = jax.make_array_from_process_local_data(sharding, local, (cap * nproc,))

h = sharded_hash_fn(mesh)(garr)
expected = int(np.bitwise_xor.reduce(allk))
got = int(np.asarray(jax.device_get(h))[0])
assert got == expected, (got, expected)

inter, a_only, b_only, sizes = sharded_set_algebra_fn(mesh)(garr, garr)
s = np.asarray(jax.device_get(sizes))[0]
assert int(s[0]) == allk.size and int(s[1]) == 0 and int(s[2]) == 0, s

# Production counting driver across processes: every process holds the
# same input stream; mesh_count shards it (with halos), runs the
# all_to_all radix exchange, and gathers exact global counts back.
from kmerset_tpu.core.kmer_counter import extract_kmers
from kmerset_tpu.parallel import driver

codes = rng.integers(0, 4, 5000).astype(np.int32)
offsets = np.array([0, 2200, 5000], dtype=np.int64)
got = driver.mesh_count(codes, offsets, 11, True, mesh=mesh)
assert got is not None
uniq, counts = got
hu, hc = np.unique(extract_kmers(codes, offsets, 11, True), return_counts=True)
assert np.array_equal(uniq, hu) and np.array_equal(counts, hc)

# Multi-host graph phase: the sharded unitig front-end across processes.
from kmerset_tpu.core import spss as spss_mod

res = driver.mesh_unitig_succ(hu, 11, mesh=mesh)
assert res is not None
succ, term_l, term_r, both = res
rdeg, rnbr, rsame = spss_mod._side_table_canonical(hu, 11, right=True)
ldeg, lnbr, lsame = spss_mod._side_table_canonical(hu, 11, right=False)
mate_r = np.where(rsame, rdeg[rnbr], ldeg[rnbr])
h_tr = (rdeg != 1) | (mate_r != 1)
mate_l = np.where(lsame, ldeg[lnbr], rdeg[lnbr])
h_tl = (ldeg != 1) | (mate_l != 1)
assert np.array_equal(term_r, h_tr) and np.array_equal(term_l, h_tl)
assert np.array_equal(succ[0::2], np.where(h_tr, -1, 2 * rnbr + rsame))

# Multi-host chain resolution + grouping: pointer doubling and the
# owner-routed end exchange across processes, vs the host walk.
n2 = 400
perm = rng.permutation(n2).astype(np.int64)
succ2 = np.full(n2, -1, dtype=np.int64)
succ2[perm[:-1]] = perm[1:]
cuts = list(range(12, n2 - 1, 13))
for c in cuts:
    succ2[perm[c]] = -1
starts2 = perm[[0] + [c + 1 for c in cuts]]
got = driver.mesh_chain_group(succ2, starts2, mesh=mesh)
assert got is not None
exp_nodes, exp_groups = [], [0]
for s0 in starts2:
    u = int(s0)
    while u >= 0:
        exp_nodes.append(u)
        u = int(succ2[u])
    exp_groups.append(len(exp_nodes))
assert np.array_equal(got[0], np.array(exp_nodes))
assert np.array_equal(got[1], np.array(exp_groups))

# Multi-host string emission: the same chains rendered to base codes on
# the process-spanning mesh, vs the host render of the expected groups.
A2 = np.sort(rng.choice(1 << 18, size=n2, replace=False)).astype(np.int64)
em = spss_mod._mesh_emit_ordered(A2, 9, succ2, starts2, oriented=False)
assert em is not None
exp_ps = spss_mod._emit_kmer_chains(
    A2, 9, np.array(exp_nodes), np.array(exp_groups), oriented=False
)
assert em[0].to_strings() == exp_ps.to_strings()

# Multi-host greedy matching vs the host fixpoint.
from kmerset_tpu.core.graph import handshake_matching

pa = rng.integers(0, n2, 1500).astype(np.int64)
pb = rng.integers(0, n2, 1500).astype(np.int64)
keep = pa != pb
pa, pb = pa[keep], pb[keep]
got_m = driver.mesh_matching(pa, pb, n2, mesh=mesh)
assert got_m is not None
assert np.array_equal(got_m, handshake_matching(pa, pb, n2))

# Multi-host overlap-edge discovery on real unitigs.
from kmerset_tpu.core.kmer_set import KmerSet

unitigs = spss_mod.get_unitigs_canonical(KmerSet(11, hu))
P1 = unitigs.first_kmers(11)
S1 = unitigs.last_kmers(11)
got_e = driver.mesh_overlap_edges(P1, S1, 11, mesh=mesh)
assert got_e is not None
from kmerset_tpu.core import native

want_e = native.overlap_edges(P1, S1, 11)
if want_e is not None:
    assert np.array_equal(got_e[0], want_e[0])
    assert np.array_equal(got_e[1], want_e[1])

print(f"proc {pid}: ok")
"""


_CHILD_UNEVEN = r"""
import sys
import numpy as np

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", nproc, pid)

from kmerset_tpu.core.kmer_counter import extract_kmers
from kmerset_tpu.parallel import driver
from kmerset_tpu.parallel.mesh import make_mesh

assert len(jax.local_devices()) == 4
# Truncated mesh: process 0 contributes 4 devices, process 1 only 2 —
# the uneven case where a process's shard positions are NOT
# process_index * its own device count (driver._stride_global must
# slice by actual mesh position).
mesh = make_mesh(6)
assert mesh.devices.size == 6

rng = np.random.default_rng(3)
codes = rng.integers(0, 4, 5000).astype(np.int32)
offsets = np.array([0, 1800, 5000], dtype=np.int64)
got = driver.mesh_count(codes, offsets, 11, True, mesh=mesh)
assert got is not None
uniq, counts = got
hu, hc = np.unique(extract_kmers(codes, offsets, 11, True), return_counts=True)
assert np.array_equal(uniq, hu), "uneven-mesh uniq mismatch"
assert np.array_equal(counts, hc), "uneven-mesh counts mismatch"
print(f"proc {pid}: ok")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_mesh(tmp_path):
    nproc = 2
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one device per process
    # The child runs from tmp_path, so the repo root is not on sys.path
    # automatically; make the package importable without requiring pip install.
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p), str(nproc), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=repo_root,
        )
        for p in range(nproc)
    ]
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=300)
        outs.append(out.decode())
    for p, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {p} failed:\n{out}"
        assert f"proc {p}: ok" in out


@pytest.mark.slow
def test_two_process_uneven_device_mesh(tmp_path):
    """Processes contributing unequal device counts to a truncated mesh:
    counting parity across 2 processes x 4 devices with make_mesh(6)."""
    nproc = 2
    port = _free_port()
    script = tmp_path / "child_uneven.py"
    script.write_text(_CHILD_UNEVEN)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p), str(nproc), str(port)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=repo_root,
        )
        for p in range(nproc)
    ]
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=300)
        outs.append(out.decode())
    for p, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {p} failed:\n{out}"
        assert f"proc {p}: ok" in out
