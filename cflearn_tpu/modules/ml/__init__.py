from . import fcnn, linear
