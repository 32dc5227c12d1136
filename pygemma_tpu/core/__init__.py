from . import assoc, eigen, grams, reml, solver  # noqa: F401
