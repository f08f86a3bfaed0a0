from .rounding import fround, fround_sql  # noqa: F401
from .validation import (  # noqa: F401
    NULL_STRINGS,
    SENSOR_ID_PATTERN,
    VALUE_RANGES,
    failure_reasons,
    in_range,
    is_fresh,
    is_null_or_null_string,
    matches_sensor_id,
    numeric_coercible,
)
