from . import basic, common
