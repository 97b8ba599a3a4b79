from . import rhs, steppers, solvers
