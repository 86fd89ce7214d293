from .table import (  # noqa: F401
    CommitConflictError,
    ConstraintViolationError,
    LakeTable,
)
from .consumer import ChangeFeedConsumer, ChangeFeedLagError  # noqa: F401
from .schema_evolution import resolve_schema, SchemaEvolutionError  # noqa: F401
