from . import checker, gates, layout, params
