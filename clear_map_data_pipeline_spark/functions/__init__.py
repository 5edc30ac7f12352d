from .cleaning import (  # noqa: F401
    bool_decode,
    censored_decode,
    clamp,
    derived_id,
    per_100k,
)
