from . import cv, ml
