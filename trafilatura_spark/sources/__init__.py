from .tables import (  # noqa: F401
    iceberg_available,
    read_transcripts,
    write_table,
)
