"""Plotting helpers, mirroring quandary.py:1202-1358 (matplotlib)."""

from __future__ import annotations

import numpy as np


def plot_pulse(Ne, time, pt, qt):
    """Control pulses for all qubits (quandary.py:1202-1223)."""
    import matplotlib.pyplot as plt
    nrows = len(Ne)
    plt.figure()
    for iosc in range(len(Ne)):
        plt.subplot(nrows, 1, iosc + 1)
        plt.plot(time, pt[iosc], "r", label="p(t)")
        plt.plot(time, qt[iosc], "b", label="q(t)")
        plt.xlabel("time (ns)")
        plt.ylabel("Drive strength [MHz]")
        maxp = max(np.abs(pt[iosc]))
        maxq = max(np.abs(qt[iosc]))
        plt.title(f"Qubit {iosc}\n max. drive {round(maxp, 1)}, {round(maxq, 1)} MHz")
        plt.legend(loc="lower right")
        plt.xlim([0.0, time[-1]])
    plt.subplots_adjust(hspace=0.6)
    plt.draw()
    plt.show()


def plot_expectedEnergy(Ne, time, expectedEnergy):
    """Evolution of expected energy levels (quandary.py:1225-1257)."""
    import matplotlib.pyplot as plt
    ninit = len(expectedEnergy[0])
    ncols = 2 if ninit >= 4 else 1
    nrows = int(np.ceil(ninit / ncols))
    plt.figure(figsize=(6.4 * nrows * 0.75, 4.8 * nrows * 0.75))
    for iplot in range(ninit):
        plt.subplot(nrows, ncols, iplot + 1)
        emax = 1.0
        for iosc in range(len(Ne)):
            label = f"Qubit {iosc}" if len(Ne) > 1 else ""
            plt.plot(time, expectedEnergy[iosc][iplot], label=label)
            emax = max(emax, np.max(expectedEnergy[iosc][iplot]))
        plt.xlabel("time (ns)")
        plt.ylabel("expected energy")
        plt.ylim([-1e-2, emax + 1e-2])
        plt.xlim([0.0, time[-1]])
        bid = iplot if len(Ne) == 1 else bin(iplot).replace("0b", "").zfill(len(Ne))
        plt.title(f"from |{bid}>")
        plt.legend(loc="lower right")
    plt.subplots_adjust(hspace=0.5, wspace=0.5)
    plt.draw()
    plt.show()


def plot_population(Ne, time, population):
    """Evolution of populations (quandary.py:1259-1291)."""
    import matplotlib.pyplot as plt
    ninit = len(population[0])
    ncols = 2 if ninit >= 4 else 1
    nrows = int(np.ceil(ninit / ncols))
    plt.figure(figsize=(6.4 * nrows * 0.75, 4.8 * nrows * 0.75))
    for iplot in range(ninit):
        plt.subplot(nrows, ncols, iplot + 1)
        for iosc in range(len(Ne)):
            for istate in range(Ne[iosc]):
                label = (f"Qubit {iosc} " if len(Ne) > 1 else "") + f"|{istate}>"
                plt.plot(time, population[iosc][iplot][istate], label=label)
        plt.xlabel("time (ns)")
        plt.ylabel("population")
        plt.ylim([-1e-4, 1.0 + 1e-2])
        plt.xlim([0.0, time[-1]])
        bid = iplot if len(Ne) == 1 else bin(iplot).replace("0b", "").zfill(len(Ne))
        plt.title(f"from |{bid}>")
        plt.legend(loc="lower right")
    plt.subplots_adjust(hspace=0.5, wspace=0.5)
    plt.draw()
    plt.show()


def plot_results_1osc(myconfig, p, q, expectedEnergy, population):
    """All results of one oscillator incl. pulse FFT (quandary.py:1293-1358)."""
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(2, 3, figsize=(20, 8))
    fig.subplots_adjust(hspace=0.3)
    t = myconfig.time

    ax[0, 0].plot(t, p, label="I")
    ax[0, 0].plot(t, q, label="Q")
    ax[0, 0].set_ylabel("Pulse amplitude (MHz)")
    ax[0, 0].set_xlabel("Time (ns)")
    ax[0, 0].legend()
    ax[0, 0].grid()

    zlist = np.array(p) * 1e-3 + 1j * np.array(q) * 1e-3
    fft = np.fft.fft(zlist)
    dt = myconfig.T / myconfig.nsteps
    fftfr = np.fft.fftfreq(len(zlist), d=dt)
    ax[0, 1].scatter(fftfr * 1e3, np.abs(fft) ** 2)
    ax[0, 1].set_ylabel("FFT")
    ax[0, 1].set_xlabel("Frequency (MHz)")
    ax[0, 1].grid()
    ax[0, 1].set_title("FFT")
    ax[0, 1].set_yscale("log")
    ax[0, 1].set_xlim(-500, 500)

    for iinit in range(len(population)):
        for istate in range(myconfig.Ne[0]):
            ax[1, iinit].plot(t, population[iinit][istate], label=f"|{istate}>")
        ax[1, iinit].set_xlabel("Time (ns)")
        ax[1, iinit].set_ylabel("Population")
        ax[1, iinit].legend()
        ax[1, iinit].set_title(f"Populations from |{iinit}>")
        ax[1, iinit].grid()

    for iinit in range(len(expectedEnergy)):
        ax[0, 2].plot(t, expectedEnergy[iinit], label=f"from |{iinit}>")
    ax[0, 2].set_xlabel("Time (ns)")
    ax[0, 2].set_ylabel("Expected Energy Level")
    ax[0, 2].legend()
    ax[0, 2].set_title("Expected Energy Level")
    ax[0, 2].grid()
    plt.draw()
    plt.show()


def timestep_richardson_est(quandary, tol=1e-8, order=2, quandary_exec="", **kwargs):
    """Richardson time-step error estimator (quandary.py:1360-1409): halve dt
    until the estimated error in the infidelity meets the tolerance."""
    m = 2
    quandary.verbose = False
    t, pt, qt, infidelity, _, _ = quandary.simulate(datadir="TS_test")
    Jcurr = infidelity
    uT = np.copy(quandary.uT)

    errs_J, errs_u, dts = [], [], []
    for i in range(10):
        dt_org = quandary.T / quandary.nsteps
        quandary.nsteps = quandary.nsteps * m
        quandary.dT = quandary.T / quandary.nsteps
        t, pt, qt, infidelity, _, _ = quandary.simulate(datadir="TS_test")
        err_J = np.abs(Jcurr - infidelity) / (m ** order - 1.0)
        err_u = np.linalg.norm(np.subtract(uT, quandary.uT)) / (m ** order - 1.0)
        errs_J.append(err_J)
        errs_u.append(err_u)
        dts.append(dt_org)
        print(f" -> Error at i={i}, dt = {dt_org}: err_J = {err_J} err_u= {err_u}")
        if err_J < tol:
            print(f"\n -> Tolerance reached. N={quandary.nsteps}, dt={dt_org}")
            break
        Jcurr = infidelity
        uT = np.copy(quandary.uT)
    return errs_J, errs_u, dts
