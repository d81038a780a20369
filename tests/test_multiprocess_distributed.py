"""REAL two-process jax.distributed test (VERDICT round-3 item 7):
replaces the PKC_PROCESS_COUNT env simulation as proof that

  * parallel.multihost.initialize wires a real coordinator,
  * the interleaved scp sharding partitions the data disjointly and
    completely across processes using the REAL jax.process_index(),
  * a cross-process psum (gradient allreduce over a global-batch mesh)
    produces identical results on every process.

Each worker is a fresh python subprocess on the CPU backend (Gloo
collectives); the parent asserts on their printed state.
"""
import os
import socket
import subprocess
import sys
import textwrap

WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = ""          # one CPU device per process
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]; scp = sys.argv[3]

    from pytorch_kaldi_cgs_tpu.parallel import multihost
    multihost.initialize(coordinator_address="127.0.0.1:" + port,
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert multihost.process_count() == 2          # real, no env override
    assert multihost.process_index() == pid

    # interleaved scp sharding with the REAL process index
    shard = multihost.shard_scp_for_host(scp)
    keys = [l.split()[0] for l in
            shard.read().decode().strip().splitlines()]
    print("KEYS %d %s" % (pid, ",".join(keys)), flush=True)

    # cross-process gradient psum: one global-batch mesh over both
    # processes' devices; each feeds its local shard; the jitted mean
    # loss + grad must come out identical everywhere
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    rng = np.random.RandomState(100 + pid)
    x_local = rng.randn(4, 8).astype(np.float32)     # per-process shard
    y_local = rng.randn(4).astype(np.float32)
    xs = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), x_local)
    ys = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), y_local)
    w = jnp.asarray(np.random.RandomState(0).randn(8).astype(np.float32))

    @jax.jit
    def loss_and_grad(w, xs, ys):
        def loss(w):
            return jnp.mean((xs @ w - ys) ** 2)   # mean -> psum over data
        return jax.value_and_grad(loss)(w)

    l, g = loss_and_grad(w, xs, ys)
    # replicated outputs: fetch scalar + checksum
    print("LOSS %d %.8f" % (pid, float(l)), flush=True)
    print("GSUM %d %.8f" % (pid, float(jnp.sum(g * g))), flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_sharding_and_psum(tmp_path):
    scp = tmp_path / "feats.scp"
    all_keys = ["utt%02d" % i for i in range(7)]
    scp.write_text("".join("%s /dev/null:0\n" % k for k in all_keys))
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = str(_free_port())

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("PKC_PROCESS_COUNT", None)
    env.pop("PKC_PROCESS_INDEX", None)
    env["XLA_FLAGS"] = ""
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), port, str(scp)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, "worker failed:\n%s\n%s" % (out, err)
        outs.append(out)

    def grab(tag, out):
        for line in out.splitlines():
            if line.startswith(tag + " "):
                return line.split(None, 2)[2]
        raise AssertionError("no %s line in %r" % (tag, out))

    k0 = grab("KEYS", outs[0]).split(",")
    k1 = grab("KEYS", outs[1]).split(",")
    # disjoint, complete, interleaved
    assert not set(k0) & set(k1)
    assert sorted(k0 + k1) == all_keys
    assert k0 == all_keys[0::2] and k1 == all_keys[1::2]

    # the psum'd loss/grad agree bit-for-bit across processes
    assert grab("LOSS", outs[0]) == grab("LOSS", outs[1])
    assert grab("GSUM", outs[0]) == grab("GSUM", outs[1])
