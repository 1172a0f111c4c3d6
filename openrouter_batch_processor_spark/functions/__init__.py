"""Column-expression re-implementations of the reference's scalar ops.

Everything here compiles to Catalyst expressions (whole-stage codegen,
no Python on the hot path) except the three irreducibly-Python UDFs
(JSON repair, timedelta render/parse) which are pandas UDFs.
"""

from openrouter_batch_processor_spark.functions.paths import (  # noqa: F401
    normalize_path,
    file_extension,
    output_filename,
    storage_name,
)
from openrouter_batch_processor_spark.functions.sizes import human_file_size  # noqa: F401
from openrouter_batch_processor_spark.functions.textops import (  # noqa: F401
    append_footer,
    json_repair_parse,
    label_text_for_prompt,
    normalize_formats,
)
from openrouter_batch_processor_spark.functions.timeops import (  # noqa: F401
    elapsed_seconds,
    format_timedelta,
    parse_timedelta,
    ts_format,
)
from openrouter_batch_processor_spark.functions.hashing import (  # noqa: F401
    content_sha256,
    data_url,
    doc_fingerprint,
    redact_api_key,
    rolling_hash,
)
from openrouter_batch_processor_spark.functions.status import (  # noqa: F401
    derive_status,
    route_label,
)
