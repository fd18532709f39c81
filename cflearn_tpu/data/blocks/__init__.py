from . import ml
