from . import rebin, interp, tridiag, twostream, rorr  # noqa: F401
