from .ntt import (  # noqa: F401
    NttEngine,
    get_engine,
)
