"""Time-step estimation and carrier-frequency resonance analysis.

Mirrors quandary.py:896-1060: the number of time steps is chosen so the
fastest period of (Hsys + estimated control) is resolved with Pmin points;
the carrier frequencies are the transition frequencies of the system
Hamiltonian between essential states that the control operators connect,
thresholded by growth rate and mutual proximity.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from .indexing import multi_index


def estimate_timesteps(*, T: float, Hsys: np.ndarray, Hc_re=(), Hc_im=(),
                       maxctrl_MHz=(), Pmin: int = 40) -> int:
    """quandary.py:896-927."""
    est_ctrl_MHz = list(maxctrl_MHz)
    if len(est_ctrl_MHz) == 0:
        est_ctrl_MHz = [10.0] * max(len(Hc_re), len(Hc_im))

    K1 = np.copy(Hsys).astype(np.complex128)
    for i in range(len(Hc_re)):
        if np.size(Hc_re[i]) > 0:
            K1 += (est_ctrl_MHz[i] * 2.0 * np.pi / 1e3) * np.asarray(Hc_re[i])
    for i in range(len(Hc_im)):
        if np.size(Hc_im[i]) > 0:
            K1 = K1 + 1j * (est_ctrl_MHz[i] * 2.0 * np.pi / 1e3) * np.asarray(Hc_im[i])

    eigenvalues = np.linalg.eigvals(K1)
    maxeig = np.max(np.abs(eigenvalues))
    samplerate = maxeig * Pmin / (2.0 * np.pi)
    return int(np.ceil(T * samplerate))


def eigen_and_reorder(H0: np.ndarray, verbose: bool = False):
    """Eigendecomposition reordered so the eigenvector matrix is as close to
    identity as possible (quandary.py:930-969)."""
    Ntot = H0.shape[0]
    evals, evects = np.linalg.eig(H0)
    reord = np.argsort(evals)
    evals = evals[reord]
    evects = evects[:, reord]

    max_col = np.array([np.argmax(np.abs(evects[row, :])) for row in range(Ntot)])
    if len(set(max_col.tolist())) != Ntot:
        raise ValueError("Permutation of eigen-vector matrix failed")

    evects = evects[:, max_col]
    evals = evals[max_col]
    for j in range(Ntot):
        if evects[j, j].real < 0.0:
            evects[:, j] = -evects[:, j]
    return evals, evects


def get_resonances(*, Ne, Ng, Hsys, Hc_re=(), Hc_im=(), rotfreq=(),
                   cw_amp_thres: float = 1e-7, cw_prox_thres: float = 1e-2,
                   verbose: bool = False, stdmodel: bool = True):
    """System resonances used as carrier-wave frequencies (quandary.py:972-1060).

    Returns (om, growth_rate): om[q] is an array of carrier frequencies [GHz]
    for oscillator q (at least [0.0]).
    """
    nqubits = len(Ne)
    n = Hsys.shape[0]
    nlevels = [Ne[i] + Ng[i] for i in range(nqubits)]

    Hsys_evals, Utrans = eigen_and_reorder(Hsys, verbose)
    Hsys_evals = Hsys_evals.real / (2.0 * np.pi)

    resonances: List[List[float]] = []
    speed: List[List[float]] = []
    for q in range(nqubits):
        Hsym_trans = Utrans.conj().T @ np.asarray(Hc_re[q]) @ Utrans
        Hanti_trans = Utrans.conj().T @ np.asarray(Hc_im[q]) @ Utrans
        res_a: List[float] = []
        speed_a: List[float] = []
        for Hc_trans in (Hsym_trans, Hanti_trans):
            for i in range(n):
                for j in range(i):
                    if abs(Hc_trans[i, j]) < 1e-14:
                        continue
                    delta_f = Hsys_evals[i] - Hsys_evals[j]
                    if abs(delta_f) < 1e-10:
                        delta_f = 0.0
                    ids_i = multi_index(i, nlevels)
                    ids_j = multi_index(j, nlevels)
                    is_ess_i = all(ids_i[k] < Ne[k] for k in range(nqubits))
                    is_ess_j = all(ids_j[k] < Ne[k] for k in range(nqubits))
                    if is_ess_i and is_ess_j:
                        if any(abs(delta_f - f) < cw_prox_thres for f in res_a):
                            continue
                        if abs(Hc_trans[i, j]) < cw_amp_thres:
                            continue
                        res_a.append(delta_f)
                        speed_a.append(abs(Hc_trans[i, j]))
        resonances.append(res_a)
        speed.append(speed_a)

    om = []
    growth_rate = []
    for q in range(nqubits):
        if len(resonances[q]) > 0:
            om.append(np.array(resonances[q]))
            growth_rate.append(np.array(speed[q]))
        else:
            om.append(np.zeros(1))
            growth_rate.append(np.ones(1))
    return om, growth_rate
