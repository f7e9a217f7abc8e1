"""Boolean-conformance layer.

Pure-Python reimplementation of the reference engine's *semantics* —
bit-packed doc ids, posting-merge operand algebra, CHASM bytecode and an
insertion-ordered in-memory index — used to pin down golden behavior
(README.md:109-124 helloworld output) in tests.  The scale engine
(chearch_ray.pipelines / state) canonicalizes to ascending doc ids and
document-level results; this layer reproduces the reference's
posting-level, newest-first output exactly.
"""

from chearch_ray.conformance.docid import (  # noqa: F401
    MAX_DOCUMENT_INDEX,
    assemble_doc_id,
    document_index_from_doc_id,
    split_doc_id,
    text_location_from_doc_id,
)
from chearch_ray.conformance.operands import (  # noqa: F401
    FixedDataOperand,
    IntersectionOperand,
    Operand,
    PostingListOperand,
    UnionOperand,
    doc_index_of,
)
from chearch_ray.conformance.memory_index import MemoryIndex  # noqa: F401
