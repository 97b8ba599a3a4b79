"""End-to-end consumer of the stream-mode STACK cotangents (VERDICT
round 3, item 9): examples/example_calibration.py fits an uncertain
self-Kerr coefficient from synthesized trajectory data by differentiating
through make_stream_propagate w.r.t. the operator stacks — and asserts
the streamk footgun (zero stack cotangents by contract) in user position.
A regression in Sr_bar/Si_bar (pallas_stream.py bwd2) fails this test."""

import importlib.util
import os


def test_calibration_example_recovers_kerr():
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "example_calibration.py")
    spec = importlib.util.spec_from_file_location("example_calibration",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    xi = mod.main(interpret=True)   # asserts rel err < 1e-4 internally
    assert xi > 0
