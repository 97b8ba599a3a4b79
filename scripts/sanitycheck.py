#!/usr/bin/env python
"""Check that a dumped density-matrix trajectory (rho_Re/rho_Im.iinit*.dat)
is Hermitian and trace-one at every stored time point — the counterpart of
the reference's util/sanitycheck.py and the SANITY_CHECK build flag
(util.cpp:430-565).

Usage: python scripts/sanitycheck.py <rho_Re file> <rho_Im file> [N]
"""

import sys

import numpy as np

TOL = 1e-8


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 1
    re = np.loadtxt(argv[1])
    im = np.loadtxt(argv[2])
    n2 = re.shape[1] - 1
    N = int(argv[3]) if len(argv) > 3 else int(round(np.sqrt(n2)))
    assert N * N == n2, f"row length {n2} is not a square"
    bad = 0
    for row in range(re.shape[0]):
        t = re[row, 0]
        rho = (re[row, 1:] + 1j * im[row, 1:]).reshape(N, N, order="F")
        herm = np.abs(rho - rho.conj().T).max()
        tr = abs(np.trace(rho).real - 1.0)
        if herm > TOL or tr > TOL:
            print(f"t={t}: hermiticity error {herm:.2e}, trace error {tr:.2e}")
            bad += 1
    if bad == 0:
        print(f"OK: {re.shape[0]} time points Hermitian and trace-1 within {TOL}")
        return 0
    print(f"{bad} bad time points")
    return 1


if __name__ == "__main__":
    sys.exit(main(sys.argv))
