from .codec import (EncodedField, encode_field, decode_field,  # noqa: F401
                    NLAYMAX, WAV_LVL, CODER_VERSION)
