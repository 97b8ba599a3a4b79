"""Native IO/RNG library: build, format parity with the Python writers, and
mt19937 reference semantics."""

import os

import numpy as np
import pytest

from quandary_tpu.io import native


def test_native_builds():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no g++ toolchain available")
    assert lib is not None


def test_mt19937_matches_cpp_semantics():
    """Draws must be deterministic, in [0,1), and restart per call (the
    reference's pass-by-value engine copy)."""
    a = native.mt19937_uniform(1234, 16)
    if a is None:
        pytest.skip("native lib unavailable")
    b = native.mt19937_uniform(1234, 16)
    np.testing.assert_array_equal(a, b)
    assert ((a >= 0) & (a < 1)).all()
    c = native.mt19937_uniform(4321, 16)
    assert not np.array_equal(a, c)


def test_state_rows_format_matches_python(tmp_path):
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    ts = np.arange(5) * 0.25
    data = rng.normal(size=(5, 7))
    p_native = tmp_path / "native.dat"
    native.write_state_rows(str(p_native), "", ts, data, 2)
    # python reference formatting
    lines = []
    for i in range(0, 5, 2):
        lines.append("%.8f  " % ts[i] + "".join("%1.10e  " % v for v in data[i]) + "\n")
    p_py = tmp_path / "py.dat"
    p_py.write_text("".join(lines))
    assert p_native.read_text() == p_py.read_text()


def test_read_table(tmp_path):
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    p = tmp_path / "t.dat"
    p.write_text("# comment line\n1.5 2.5\n3.5\n")
    vals = native.read_table(str(p), 10)
    np.testing.assert_array_equal(vals, [1.5, 2.5, 3.5])


def test_read_triplets_matches_python(tmp_path):
    """Native sparse-triplet reader == the pure-Python parser on both
    Hamiltonian file formats (Hsys 'row col re im', Hc 'osc row col re im')."""
    if native.get_lib() is None:
        pytest.skip("native lib unavailable")
    from quandary_tpu.io import datafiles as df

    rng = np.random.default_rng(3)
    dim = 9
    H = np.zeros((dim, dim), np.complex128)
    idx = rng.choice(dim * dim, size=20, replace=False)
    H.flat[idx] = rng.normal(size=20) + 1j * rng.normal(size=20)
    H = H + H.conj().T
    p = tmp_path / "hamiltonian_Hsys.dat"
    df.write_hamiltonian_sys(str(p), H)

    got = df.read_hamiltonian_sys(str(p), dim)        # native path
    ids, vals = native.read_triplets(str(p), 2)
    assert ids.shape[1] == 2 and len(vals) == len(ids)
    # force the python fallback and compare
    import quandary_tpu.io.native as nat
    import unittest.mock as mock
    with mock.patch.object(nat, "get_lib", lambda: None):
        want = df.read_hamiltonian_sys(str(p), dim)
    np.testing.assert_allclose(got, want, rtol=0, atol=0)

    Hc_re = [np.zeros((dim, dim)) for _ in range(2)]
    Hc_im = [np.zeros((dim, dim)) for _ in range(2)]
    Hc_re[0][1, 2] = 0.5
    Hc_im[1][3, 4] = -0.25
    pc = tmp_path / "hamiltonian_Hc.dat"
    df.write_hamiltonian_ctrl(str(pc), Hc_re, Hc_im)
    got_re, got_im = df.read_hamiltonian_ctrl(str(pc), dim, 2)
    with mock.patch.object(nat, "get_lib", lambda: None):
        want_re, want_im = df.read_hamiltonian_ctrl(str(pc), dim, 2)
    for a, b in zip(got_re + got_im, want_re + want_im):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)
