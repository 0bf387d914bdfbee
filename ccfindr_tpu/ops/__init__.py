from . import reference_impl, vb, ml, consensus  # noqa: F401
