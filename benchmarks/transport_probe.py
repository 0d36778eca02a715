"""Probe the rig's REAL host->device transport characteristics.

Question this answers: is the tunnel's honest H2D bandwidth ~1.5 GB/s
(the async-dispatch number CLAUDE.md records) or ~25-40 MB/s (what the
forced-completion put ceiling in config 4 measured)? The two differ 40x
and decide whether corpus ingest has a software win left or is pinned
by the rig.

Methodology notes (this rig):
- device_put returns before the bytes land; honest timing must force
  completion with a computation over the WHOLE buffer and end in a
  scalar host readback.
- A single put measures put + RTT; the marginal cost of one put is
  recovered by differencing k puts vs 1 put (slope method).
- Each put uses a DISTINCT host buffer (copies) so no caching layer can
  alias them.

Prints one JSON line per probe.
"""

import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp  # noqa: E402


def touch(a):
    # force every byte: full-buffer reduction, not a strided sample
    return jnp.sum(a.astype(jnp.float32))


touch_j = jax.jit(touch)


def probe_put(host_buffers, sharding=None):
    """Time: for each buffer, device_put then accumulate touch; end in
    ONE readback of the summed scalar (forces all transfers)."""
    t0 = time.perf_counter()
    acc = None
    for hb in host_buffers:
        d = (
            jax.device_put(hb, sharding)
            if sharding is not None
            else jax.device_put(hb)
        )
        s = touch_j(d)
        acc = s if acc is None else acc + s
    _ = float(acc)
    return time.perf_counter() - t0


def main():
    results = []
    mb = 1024 * 1024

    for size_mb in (7, 28, 56):
        n_el = size_mb * mb // 2  # int16
        base = (np.random.default_rng(0).integers(
            -32768, 32767, n_el, dtype=np.int16))

        # warm compile
        probe_put([base])

        for k in (1, 3):
            bufs = [base + np.int16(i) for i in range(k)]
            dts = [probe_put(bufs) for _ in range(3)]
            results.append({
                "probe": "put_touch", "size_mb": size_mb, "k": k,
                "dts": [round(d, 4) for d in dts],
            })
            print(json.dumps(results[-1]), flush=True)

    # marginal bandwidth from slope: (t_k3 - t_k1) / 2 per buffer
    # (printed raw above; analysis on the caller side)

    # degradation probe: put while a long compute is in flight
    m = jnp.asarray(
        np.random.default_rng(1).standard_normal((4096, 4096)),
        dtype=jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnames="iters")
    def burn(m, iters):
        def body(c, _):
            c = jnp.abs(c @ m) * 1e-3
            return c, None
        c, _ = jax.lax.scan(body, m, None, length=iters)
        return jnp.sum(c)

    burn_j = lambda it: burn(m, it)
    _ = float(burn_j(2))  # warm

    n_el = 28 * mb // 2
    base = np.random.default_rng(2).integers(-32768, 32767, n_el,
                                             dtype=np.int16)
    probe_put([base])  # warm this shape

    for iters in (0, 600):
        if iters:
            pending = burn_j(iters)  # dispatched, NOT read back
        t0 = time.perf_counter()
        dt = probe_put([base + np.int16(7)])
        if iters:
            _ = float(pending)
        results.append({
            "probe": "put_during_compute", "burn_iters": iters,
            "size_mb": 28, "put_dt": round(dt, 4),
            "total_dt": round(time.perf_counter() - t0, 4),
        })
        print(json.dumps(results[-1]), flush=True)


if __name__ == "__main__":
    sys.exit(main())
