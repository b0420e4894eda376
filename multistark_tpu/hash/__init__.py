from .blake3 import blake3_hash, Blake3Device  # noqa: F401
