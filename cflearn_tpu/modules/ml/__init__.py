from . import fcnn, linear, nets
