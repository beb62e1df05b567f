from . import pyref
