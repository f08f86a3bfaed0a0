from .validation import (  # noqa: F401
    NULL_STRINGS,
    VALUE_RANGES,
    failure_reasons,
    is_null_or_null_string,
    is_valid,
)
