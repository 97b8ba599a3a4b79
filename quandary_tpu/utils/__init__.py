from . import indexing, operators, splines, resonances
