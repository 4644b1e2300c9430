"""Single source of version truth.

Parity: keras_rs/src/version.py:4-9.
"""

__version__ = "0.1.0"


def version() -> str:
    return __version__
