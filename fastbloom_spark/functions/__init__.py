from .digest import digest64, register_digest, sha256_hex

__all__ = ["digest64", "register_digest", "sha256_hex"]
