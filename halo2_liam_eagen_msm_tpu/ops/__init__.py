from . import ff
