from .table import CommitConflictError, LakeTable  # noqa: F401
from .consumer import ChangeFeedConsumer, ChangeFeedLagError  # noqa: F401
from .schema_evolution import resolve_schema, SchemaEvolutionError  # noqa: F401
