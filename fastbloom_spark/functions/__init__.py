from .codecs import (decode_bmp, decode_wav, encode_bmp, encode_wav,
                     sniff_media)
from .digest import digest64, register_digest, sha256_hex

__all__ = ["digest64", "register_digest", "sha256_hex",
           "decode_bmp", "decode_wav", "encode_bmp", "encode_wav",
           "sniff_media"]
