from . import conv, erf
