from . import common, ddr
