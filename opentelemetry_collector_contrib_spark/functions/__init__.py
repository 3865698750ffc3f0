from .ottl import (  # noqa: F401
    compile_condition,
    compile_statement,
    compile_value,
    drop_cache_columns,
)
