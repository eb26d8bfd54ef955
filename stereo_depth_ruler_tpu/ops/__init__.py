from .sgbm_ref import SGBMParams  # noqa: F401
