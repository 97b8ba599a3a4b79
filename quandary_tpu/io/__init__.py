from . import output, configfile, datafiles
