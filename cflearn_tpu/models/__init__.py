from . import common
from .ml import common as ml_common
from . import cv
