from .table import LakeTable  # noqa: F401
from .schema_evolution import resolve_schema, SchemaEvolutionError  # noqa: F401
