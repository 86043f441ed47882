from .digest import digest64, sha256_hex

__all__ = ["digest64", "sha256_hex"]
