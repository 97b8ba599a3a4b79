"""End-to-end tests of the user-facing Quandary API, mirroring the
reference's tests/python examples (in-process, no mpirun)."""

import os

import numpy as np
import pytest

from quandary_tpu import Quandary


def test_state_to_state(tmp_path):
    """Mirror of tests/python/test_example_state_to_state.py: drive |1> to
    (|0>+|1>)/sqrt(2) on a 2+1 level transmon. The reference reaches
    infidelity 8.7e-6 with its seed; we require the 1e-4 class (random
    initializations differ)."""
    q = Quandary(
        Ne=[2], Ng=[1], freq01=[4.10595], selfkerr=[0.2198],
        maxctrl_MHz=4.0,
        initialcondition=[1.0, 0.0],
        targetstate=[1.0 / np.sqrt(2), 1.0 / np.sqrt(2)],
        T=50.0, tol_infidelity=1e-5, rand_seed=4321, verbose=False,
    )
    t, pt, qt, infidelity, energy, population = q.optimize(
        datadir=str(tmp_path / "s2s"))
    assert infidelity < 1e-4, infidelity
    assert len(t) == q.nsteps + 1
    assert len(pt) == 1 and len(pt[0]) == len(t)
    # initial state [1,0] = |0>: level-0 population 1 -> 1/2
    assert abs(population[0][0][0][0] - 1.0) < 1e-12
    assert abs(population[0][0][0][-1] - 0.5) < 0.05
    # output files exist in reference format
    assert os.path.exists(tmp_path / "s2s" / "params.dat")
    assert os.path.exists(tmp_path / "s2s" / "control0.dat")


def test_simulate_unitary(tmp_path):
    """Forward simulation of all basis states with zero controls: uT must be
    the (diagonal) drift propagator, and unitary."""
    q = Quandary(
        Ne=[2, 2], freq01=[4.8, 4.9], rotfreq=[4.8, 4.9],
        selfkerr=[0.0, 0.0], Jkl=[0.0], T=10.0,
        randomize_init_ctrl=False, initctrl_MHz=0.0,
        costfunction="Jfrobenius", optim_target="pure, 0, 0",
        verbose=False,
    )
    t, pt, qt, infid, energy, population = q.simulate(datadir=str(tmp_path / "sim"))
    uT = np.asarray(q.uT)
    assert uT.shape == (4, 4)
    np.testing.assert_allclose(uT @ uT.conj().T, np.eye(4), atol=1e-8)
    # zero drift in the rotating frame at zero detuning/kerr: identity
    np.testing.assert_allclose(uT, np.eye(4), atol=1e-8)


def test_evalcontrols():
    q = Quandary(Ne=[2], freq01=[4.1], selfkerr=[0.2], T=20.0,
                 randomize_init_ctrl=False, initctrl_MHz=5.0, verbose=False)
    ts, pt, qt = q.evalControls(points_per_ns=2)
    assert len(ts) == 41
    assert len(pt[0]) == 41
    # constant-amplitude init: p at interior points nonzero
    assert np.max(np.abs(pt[0])) > 0.1


def test_lindblad_api(tmp_path):
    """Open-system simulation through the API: trace preservation."""
    q = Quandary(
        Ne=[2], Ng=[0], freq01=[4.1], selfkerr=[0.2], T1=[50.0], T2=[30.0],
        T=20.0, randomize_init_ctrl=False, initctrl_MHz=2.0,
        initialcondition="pure, 1", optim_target="pure, 0",
        costfunction="Jfrobenius", verbose=False,
    )
    t, pt, qt, infid, energy, population = q.simulate(datadir=str(tmp_path / "lind"))
    pops = population[0][0]       # (nlevels, nt)
    np.testing.assert_allclose(pops.sum(axis=0), 1.0, atol=1e-8)
    # decay toward ground state
    assert pops[1][-1] < pops[1][0]


def test_env_variable_datadir(tmp_path, monkeypatch):
    """QUANDARY_BASE_DATADIR resolution (quandary.py:1083-1111 /
    tests/python/test_env_variable.py)."""
    from quandary_tpu.api import resolve_datadir

    base = tmp_path / "base"
    base.mkdir()
    monkeypatch.setenv("QUANDARY_BASE_DATADIR", str(base))
    assert resolve_datadir("run1") == str(base / "run1")
    assert resolve_datadir(str(tmp_path / "abs")) == str(tmp_path / "abs")
    monkeypatch.setenv("QUANDARY_BASE_DATADIR", str(tmp_path / "missing"))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        resolve_datadir("run1")


def test_swap02_three_oscillators(tmp_path):
    """3-oscillator SWAP between qubits 0 and 2 (mirror of
    tests/python/test_example_swap02 at reduced duration): the optimizer
    must make substantial progress on the swap02 gate."""
    import numpy as np
    swap02 = np.zeros((8, 8), dtype=complex)
    for i in range(8):
        b = [(i >> 2) & 1, (i >> 1) & 1, i & 1]
        j = (b[2] << 2) | (b[1] << 1) | b[0]
        swap02[j, i] = 1.0
    freq01 = [4.8, 5.0, 5.2]
    q = Quandary(
        Ne=[2, 2, 2], freq01=freq01, rotfreq=freq01,
        selfkerr=[0.22, 0.23, 0.24], Jkl=[0.01, 0.004, 0.01],
        T=100.0, targetgate=swap02, rand_seed=1234, maxiter=30,
        initctrl_MHz=5.0, verbose=False,
        # explicit carriers: the degenerate-eigenvalue reorder in the
        # automatic resonance analysis rejects this symmetric configuration
        # (same failure mode as the reference's eigen_and_reorder)
        carrier_frequency=[[0.0, freq01[1] - freq01[0]],
                           [0.0, freq01[0] - freq01[1]],
                           [0.0, freq01[1] - freq01[2]]],
    )
    t, pt, qt, infid, energy, population = q.optimize(datadir=str(tmp_path / "swap02"))
    # smoke-level quality: a hard gate at short duration; require monotone
    # optimizer progress and a sane infidelity
    assert infid < 1.0
    assert len(q.optim_hist["Cost"]) >= 2
    assert q.optim_hist["Cost"][-1] < q.optim_hist["Cost"][0] - 1e-3
    assert len(pt) == 3 and len(population) == 3 and len(population[0]) == 8


def test_get_results_roundtrip(tmp_path):
    """get_results parses reference-format output directories (written by
    this framework or the reference binary) back into the 9-tuple."""
    q = Quandary(
        Ne=[2], Ng=[0], freq01=[4.1], selfkerr=[0.2],
        T=10.0, randomize_init_ctrl=False, initctrl_MHz=2.0,
        initialcondition="pure, 0", optim_target="pure, 1",
        costfunction="Jfrobenius", verbose=False,
    )
    d = str(tmp_path / "rt")
    t, pt, qt, infid, energy, population = q.simulate(datadir=d)
    time2, pt2, qt2, uT2, energy2, pop2, pcof2, infid2, hist2 = q.get_results(datadir=d)
    np.testing.assert_allclose(time2, t, atol=1e-8)
    np.testing.assert_allclose(pt2[0], pt[0], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(uT2)[:, 0], np.asarray(q.uT)[:, 0],
                               rtol=1e-6, atol=1e-9)
    assert abs(infid2 - infid) < 1e-10


def test_get_results_lindblad_diagonal_uT(tmp_path):
    """get_results must read the uT (rho_Re/Im) files by their PHYSICAL
    initial-condition ids: a Lindblad 'diagonal' run on one qutrit writes
    rho files named iinit 0, 4, 8 (the vectorized-diagonal positions), not
    0..2 — a range(ninit) loop leaves those uT columns silently zero."""
    q = Quandary(
        Ne=[3], Ng=[0], freq01=[4.1], selfkerr=[0.2],
        T1=[20000.0], T2=[8000.0],
        T=5.0, nsteps=40, randomize_init_ctrl=False, initctrl_MHz=2.0,
        initialcondition="diagonal, 0", costfunction="Jtrace",
        optim_target="pure, 0", verbose=False,
    )
    d = str(tmp_path / "ld")
    q.simulate(datadir=d)
    # the physical ids on disk must not be a contiguous range
    import glob
    ids = sorted(int(f[-8:-4]) for f in glob.glob(d + "/rho_Re.iinit*.dat"))
    assert ids != list(range(len(ids))), ids
    _, _, _, uT2, *_ = q.get_results(datadir=d)
    uT2 = np.asarray(uT2)
    assert uT2.shape[1] == len(ids)
    # every discovered column carries a real density matrix: unit trace
    n = int(round(np.sqrt(uT2.shape[0])))
    for c in range(uT2.shape[1]):
        rho = uT2[:, c].reshape(n, n)
        np.testing.assert_allclose(np.trace(rho).real, 1.0, atol=1e-5)


def test_spline0_piecewise_constant(tmp_path):
    """spline_order=0 optimization (mirror of
    tests/python/test_example_piecewise_constant_controls): state transfer
    with piecewise-constant pulses + total-variation penalty."""
    q = Quandary(
        Ne=[2], Ng=[1], freq01=[4.10595], selfkerr=[0.2198],
        maxctrl_MHz=12.0, initctrl_MHz=4.0, spline_order=0,
        initialcondition=[1.0, 0.0],
        targetstate=[0.0, 1.0],
        T=80.0, rand_seed=2345, maxiter=100, gamma_variation=0.001,
        verbose=False,
    )
    t, pt, qt, infid, energy, population = q.optimize(datadir=str(tmp_path / "pc"))
    assert infid < 1e-3, infid
    # piecewise-constant pulses: many exactly-repeated consecutive samples
    pvals = np.asarray(pt[0])
    rep = np.mean(np.abs(np.diff(pvals)) < 1e-12)
    assert rep > 0.5, rep


def test_cnot_with_guard_levels(tmp_path):
    """CNOT with one guard level per qubit + leakage penalty (mirror of
    tests/python/test_example_cnot_withguardlevels, abbreviated)."""
    freq01 = [4.80595, 4.8601]
    unitary = np.identity(4)
    unitary[2:, 2:] = [[0, 1], [1, 0]]
    favg = sum(freq01) / 2
    q = Quandary(
        Ne=[2, 2], Ng=[1, 1], freq01=freq01, rotfreq=[favg, favg],
        selfkerr=[0.2198, 0.2252], Jkl=[0.005],
        T=140.0, targetgate=unitary, rand_seed=1234, maxiter=12,
        gamma_leakage=0.1, verbose=False,
    )
    t, pt, qt, infid, energy, population = q.optimize(datadir=str(tmp_path / "cg"))
    hist = q.optim_hist
    assert hist["Cost"][-1] < 0.8 * hist["Cost"][0], (hist["Cost"][0], hist["Cost"][-1])
    # leakage penalty is being computed (guard levels present)
    assert np.all(np.asarray(hist["Penalty-Leakage"]) >= 0.0)
    # populations per oscillator have 3 levels (guard included)
    assert population[0][0].shape[0] == 3


def test_multistart_optimize(tmp_path):
    """multistart: on-device parallel refinement of several random starts,
    then host polishing of the winner."""
    q = Quandary(
        Ne=[2], freq01=[4.10595], selfkerr=[0.2198], maxctrl_MHz=8.0,
        initialcondition="pure, 0", optim_target="pure, 1",
        costfunction="Jfrobenius", T=60.0, rand_seed=11, maxiter=25,
        verbose=False,
    )
    t, pt, qt, infid, energy, population = q.optimize(
        datadir=str(tmp_path / "ms"), multistart=4)
    assert infid < 1e-4, infid


def test_dump_reference_config_roundtrip(tmp_path):
    """dump_reference_config -> our CLI runs the dumped directory -> the
    objective matches the direct in-process simulation (bidirectional
    config interop)."""
    import jax.numpy as jnp
    from quandary_tpu.cli import run as cli_run

    unitary = np.eye(4, dtype=complex)
    unitary[2:, 2:] = [[0, 1], [1, 0]]
    freq01 = [4.8, 4.9]
    q = Quandary(
        Ne=[2, 2], freq01=freq01, rotfreq=freq01, selfkerr=[0.2, 0.21],
        Jkl=[0.004], T=50.0, targetgate=unitary,
        randomize_init_ctrl=False, initctrl_MHz=3.0,
        carrier_frequency=[[0.0], [0.0]], verbose=False,
    )
    # direct in-process simulation
    t, pt, qt, infid, energy, population = q.simulate(datadir=str(tmp_path / "direct"))
    direct_obj = np.loadtxt(tmp_path / "direct" / "optim_history.dat")[1]

    # dumped config through the CLI
    cfg = q.dump_reference_config(runtype="simulation", datadir=str(tmp_path / "dump"))
    res = cli_run(cfg, quiet=True, datadir_override=str(tmp_path / "dump_out"))
    assert abs(res["objective"] - float(direct_obj)) < 1e-9 * max(1.0, abs(direct_obj))
    # dumped artifacts exist for reference-binary consumption
    assert (tmp_path / "dump" / "targetgate.dat").exists()


def test_simulate_with_sampled_pulses(tmp_path):
    """simulate(pt0=..., qt0=...): given sampled pulses are downsampled onto
    spline0 coefficients and propagated (quandary.py:328-347, 444-488)."""
    q = Quandary(
        Ne=[2], freq01=[4.1], selfkerr=[0.2], T=20.0,
        randomize_init_ctrl=False, initctrl_MHz=0.0,
        initialcondition="pure, 0", optim_target="pure, 1",
        costfunction="Jfrobenius", verbose=False,
    )
    nt = q.nsteps + 1
    tgrid = np.linspace(0, q.T, nt)
    pt0 = [10.0 * np.sin(np.pi * tgrid / q.T)]      # MHz
    qt0 = [np.zeros(nt)]
    t, pt, qt, infid, energy, population = q.simulate(
        pt0=pt0, qt0=qt0, datadir=str(tmp_path / "sampled"))
    # the propagated pulse follows the requested envelope
    pt_arr = np.asarray(pt[0])
    k = len(pt_arr) // 2
    assert abs(pt_arr[k] - 10.0) < 0.5, pt_arr[k]
    # the drive moves population out of |0>
    assert population[0][0][0][-1] < 0.99


def test_cli_evalcontrols(tmp_path):
    """CLI evalcontrols runtype: writes params + controls without propagating."""
    from quandary_tpu.cli import run as cli_run
    import shutil

    cfg_text = (tmp_path / "ec.cfg")
    cfg_text.write_text(
        "nlevels = 2\nntime = 100\ndt = 0.1\ntransfreq = 4.1\nrotfreq = 4.1\n"
        "selfkerr = 0.2\ncollapse_type = none\ninitialcondition = pure, 0\n"
        "control_segments0 = spline, 10\ncontrol_initialization0 = constant, 0.003\n"
        "carrier_frequency0 = 0.0\noptim_target = pure, 1\n"
        "optim_objective = Jfrobenius\nruntype = evalcontrols\ndatadir = out\n")
    res = cli_run(str(cfg_text), quiet=True)
    d = res["datadir"]
    assert os.path.exists(os.path.join(d, "params.dat"))
    ctrl = np.loadtxt(os.path.join(d, "control0.dat"))
    assert ctrl.shape[0] == 101
    # constant init 0.003 GHz -> p column ~0.003 at interior points
    assert abs(ctrl[50, 1] - 0.003) < 1e-6


# ----- reference python-tier example parity: spinchain, qft, swap12 -----

_REF_PYTESTS = "/root/reference/tests/python"


def _ref_expected(fname, *names):
    """Parse EXPECTED_* literal assignments out of a reference python test
    file without importing it (it imports the reference's own quandary.py).
    The arrays are the reference's committed regression data — we read them
    at test time exactly like the golden .dat files."""
    import ast
    with open(os.path.join(_REF_PYTESTS, fname)) as f:
        tree = ast.parse(f.read())
    out = {}
    for node in tree.body:
        if isinstance(node, ast.Assign) and len(node.targets) == 1 \
                and isinstance(node.targets[0], ast.Name) \
                and node.targets[0].id in names:
            out[node.targets[0].id] = ast.literal_eval(node.value)
    assert set(out) == set(names), f"missing {set(names) - set(out)}"
    return out


@pytest.mark.skipif(not os.path.isdir(_REF_PYTESTS),
                    reason="reference checkout not available")
def test_spinchain_via_api(tmp_path):
    """Mirror of tests/python/test_example_spinchain.py:124-223: an 8-site
    spin chain mapped onto Quandary coefficients (freq01/crosskerr/Jkl),
    domain-wall initial state, zero controls, forward simulation. Fully
    deterministic, so the reference's hard-coded sampled populations are a
    true golden — compared at the reference's own rtol 1e-3."""
    N = 8
    rng = np.random.RandomState(9001)  # reference uses np.random.seed(9001)
    h = rng.uniform(-1.0, 1.0, N)
    U = np.zeros(N)
    J = np.ones(N)

    # spin-chain -> Quandary coefficient map (test_example_spinchain.py:124-155)
    freq01 = np.zeros(N)
    freq01[0] = (-2 * h[0] - 2 * U[0]) / (2 * np.pi)
    freq01[N - 1] = (-2 * h[N - 1] - 2 * U[N - 2]) / (2 * np.pi)
    for i in range(1, N - 1):
        freq01[i] = (-2 * h[i] - 2 * U[i] - 2 * U[i - 1]) / (2 * np.pi)
    Jkl, crosskerr = [], []
    for i in range(N):
        for j in range(i + 1, N):
            Jkl.append(-2 * J[i] / (2 * np.pi) if j == i + 1 else 0.0)
            crosskerr.append(-4 * U[i] / (2 * np.pi) if j == i + 1 else 0.0)

    initcond = "pure, " + ", ".join(
        str(1 if i < N // 2 else 0) for i in range(N)) + ", "

    q = Quandary(
        Ne=[2] * N, Ng=[0] * N, freq01=freq01, rotfreq=np.zeros(N),
        crosskerr=crosskerr, Jkl=Jkl, initialcondition=initcond,
        T=10.0, dT=0.01, initctrl_MHz=0.0,
        carrier_frequency=[[0.0]] * N, verbose=False,
    )
    t, pt, qt, infidelity, energy, population = q.simulate(
        datadir=str(tmp_path / "spinchain"))

    exp = _ref_expected("test_example_spinchain.py",
                        "EXPECTED_LENGTH", "EXPECTED_INFIDELITY",
                        "EXPECTED_ENERGY", "EXPECTED_POPULATION")
    L = exp["EXPECTED_LENGTH"]
    assert len(t) == L and t[0] == 0.0 and abs(t[-1] - 10.0) < 1e-12
    idx = [int(i * (L - 1) / 9) for i in range(10)]
    assert infidelity == pytest.approx(exp["EXPECTED_INFIDELITY"],
                                       rel=1e-3, abs=1e-10)
    for i in range(N):
        np.testing.assert_allclose(
            [energy[i][0][k] for k in idx], exp["EXPECTED_ENERGY"][i][0],
            rtol=1e-3, atol=1e-10, err_msg=f"energy osc {i}")
        np.testing.assert_allclose(
            [population[i][0][0][k] for k in idx],
            exp["EXPECTED_POPULATION"][i][0],
            rtol=1e-3, atol=1e-10, err_msg=f"population osc {i}")


@pytest.mark.skipif(not os.path.isdir(_REF_PYTESTS),
                    reason="reference checkout not available")
def test_swap12_via_api(tmp_path):
    """Mirror of tests/python/test_example_swap12.py: SWAP|1>,|2> gate on two
    coupled qubits, default carrier-wave computation from system resonances.
    The reference's sampled pulse arrays encode TAO's iterate path; the
    optimizer-independent contract is the derived time grid (EXPECTED_LENGTH
    pins the Pmin/spline-spacing -> nsteps logic) and the converged
    infidelity class (reference: 9.67e-5 with tol_infidelity 1e-4)."""
    freq01 = [5.12, 5.06]
    favg = sum(freq01) / len(freq01)
    unitary = np.identity(4)
    unitary[1, 1] = unitary[2, 2] = 0.0
    unitary[1, 2] = unitary[2, 1] = 1.0
    q = Quandary(
        freq01=freq01, Jkl=[5.0e-3], rotfreq=favg * np.ones(2),
        T=200.0, maxctrl_MHz=30.0 * np.ones(2), targetgate=unitary,
        verbose=False, rand_seed=1234,
    )
    exp = _ref_expected("test_example_swap12.py", "EXPECTED_LENGTH")
    assert q.nsteps + 1 == exp["EXPECTED_LENGTH"]
    t, pt, qt, infidelity, energy, population = q.optimize(
        datadir=str(tmp_path / "swap12"))
    assert len(t) == exp["EXPECTED_LENGTH"]
    assert infidelity < 1e-4, infidelity
    # population[iosc][iinit] -> (nlevels, nt): 2 oscillators, 4 basis inits
    assert len(pt) == 2 and len(population) == 2 and len(population[0]) == 4


@pytest.mark.skipif(not os.path.isdir(_REF_PYTESTS),
                    reason="reference checkout not available")
def test_qft_via_api(tmp_path):
    """Mirror of tests/python/test_example_qft.py:270-359: 3-qubit QFT gate,
    chain coupling, carrier waves auto-computed from resonances with
    amplitude/proximity thresholds (cw_amp_thres/cw_prox_thres), 10
    optimizer iterations. Pins the nsteps derivation (EXPECTED_LENGTH) and
    requires the objective to move into the reference's end-of-10-iters
    class (reference lands at infidelity 0.808)."""
    nqubits = 3
    freq01_all = [5.18, 5.12, 5.06, 5.0, 4.94]
    freq01 = [freq01_all[len(freq01_all) - i - 1] for i in range(nqubits)]
    Jkl = []
    for i in range(nqubits):
        for j in range(i + 1, nqubits):
            Jkl.append(5e-3 if j == i + 1 else 0.0)
    favg = sum(freq01) / len(freq01)
    dim = 2 ** nqubits
    om = np.exp(1j * 2 * np.pi / dim)
    qft = np.array([[om ** (j * k) / np.sqrt(dim) for k in range(dim)]
                    for j in range(dim)])
    q = Quandary(
        Ne=[2] * nqubits, Ng=[0] * nqubits, freq01=freq01, Jkl=Jkl,
        rotfreq=favg * np.ones(nqubits), T=100.0, Pmin=300,
        spline_knot_spacing=3.0, targetgate=qft, verbose=False,
        rand_seed=1234, maxctrl_MHz=25.0, cw_amp_thres=5e-2,
        cw_prox_thres=1e-3, gamma_energy=1e-4, gamma_tik0=1e-3,
        gamma_dpdm=0.0, maxiter=10,
    )
    exp = _ref_expected("test_example_qft.py", "EXPECTED_LENGTH")
    assert q.nsteps + 1 == exp["EXPECTED_LENGTH"]
    t, pt, qt, infidelity, energy, population = q.optimize(
        datadir=str(tmp_path / "qft"))
    assert len(t) == exp["EXPECTED_LENGTH"]
    # 10 iterations barely move this hard problem (ref: 0.808 from ~0.875
    # at iteration 0); require the same "moved but unconverged" class
    assert infidelity < 0.9, infidelity
    assert len(pt) == nqubits


@pytest.mark.skipif(not os.path.isdir(_REF_PYTESTS),
                    reason="reference checkout not available")
def test_cnot_const_init_ctrl_via_api(tmp_path):
    """Mirror of tests/python/test_example_cnot_const_init_ctrl.py: CNOT
    optimization started from a CONSTANT (non-randomized) initial control
    of 100 MHz amplitude — the full API path through
    randomize_init_ctrl=False (constant p/q spline coefficients,
    quandary.py _initial_params constant branch). Pins the derived time
    grid (EXPECTED_LENGTH = 1222) and requires convergence into the
    reference's infidelity class (3.6980e-05 < tol_infidelity 1e-4)."""
    freq01 = [4.80595, 4.8601]
    favg = sum(freq01) / len(freq01)
    unitary = np.identity(4)
    unitary[2, 2] = unitary[3, 3] = 0.0
    unitary[2, 3] = unitary[3, 2] = 1.0
    q = Quandary(
        freq01=freq01, Jkl=[0.005], rotfreq=favg * np.ones(2), T=200.0,
        targetgate=unitary, verbose=False, initctrl_MHz=100.0,
        randomize_init_ctrl=False,
    )
    exp = _ref_expected("test_example_cnot_const_init_ctrl.py",
                        "EXPECTED_LENGTH", "EXPECTED_INFIDELITY")
    assert q.nsteps + 1 == exp["EXPECTED_LENGTH"]
    # constant initial control: every spline coefficient equals
    # initctrl_MHz/1000/sqrt(2)/nf (quandary.py constant branch)
    p0 = np.asarray(q.pcof0) if len(q.pcof0) else None
    t, pt, qt, infidelity, energy, population = q.optimize(
        datadir=str(tmp_path / "cnot_const"))
    assert len(t) == exp["EXPECTED_LENGTH"]
    assert infidelity < 1e-4, infidelity
    assert len(population) == 2 and len(population[0]) == 4
    # pin the CONSTANT initial-coefficient semantics: per oscillator k all
    # coefficients equal initctrl_MHz/1000/sqrt(2)/nf_k * 2pi (up to
    # boundary-condition zeroing), i.e. no randomization happened
    osc = q._build_setup().oscillators
    params0 = q._initial_params(osc)
    off = 0
    for k, o in enumerate(osc):
        nf = len(o.carrier_freqs)
        a = 100.0 / 1000.0 / np.sqrt(2.0) / nf * 2 * np.pi
        chunk = params0[off:off + o.nparams]
        off += o.nparams
        nz = chunk[chunk != 0.0]
        assert nz.size > 0 and np.allclose(nz, a), (k, nz[:4], a)
