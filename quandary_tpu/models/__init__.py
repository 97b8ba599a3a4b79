from . import controls, gates, hamiltonian, initialconditions
