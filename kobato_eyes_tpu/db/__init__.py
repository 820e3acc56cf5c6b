"""Host catalog: durable SQLite metadata store.

The hot query path lives on-device (``kobato_eyes_tpu.query.engine``); this
package is the durability/metadata layer the device index epochs are built
from — the TPU-first refactoring of the reference's ``src/db/`` in which
SQLite stops being the search engine and becomes the system of record.
"""

from kobato_eyes_tpu.db.connection import bootstrap, connect, quiesced
from kobato_eyes_tpu.db.schema import CURRENT_SCHEMA_VERSION, ensure_schema

__all__ = [
    "CURRENT_SCHEMA_VERSION",
    "bootstrap",
    "connect",
    "ensure_schema",
    "quiesced",
]
