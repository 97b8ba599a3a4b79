from . import lbfgsb, driver
