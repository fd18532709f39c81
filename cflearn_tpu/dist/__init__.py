from . import launch
from . import ml
from .launch import run_distributed
