"""The official bench's delivered-optimization probe must keep working:
bench.multistart_protocol is the SHARED protocol behind both the driver's
BENCH record (delivered_opt_* fields) and scripts/perf/multistart_bench.py.
This pins that it runs end-to-end (tiny population, CPU scan engine) and
that its record fields are sane — a signature or wiring break here would
otherwise only surface in the driver's end-of-round bench run."""

import numpy as np


def test_multistart_protocol_end_to_end():
    import bench

    r = bench.multistart_protocol(E=2, iters=2)
    fb, tr = np.asarray(r["fb"]), np.asarray(r["tr"])
    assert fb.shape == (2,)
    assert tr.shape == (3, 2)
    # monotone best-so-far per candidate
    assert np.all(fb <= tr[0] + 1e-12)
    # warmup count is static (min(ls_warmup=3, iters=2))
    assert r["nladder"] == 2
    assert r["warm_wall_s"] > 0.0
    # objectives are finite and the optimization moved
    assert np.all(np.isfinite(fb))
    assert np.min(fb) < np.min(tr[0])
