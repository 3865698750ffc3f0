from .ottl import compile_condition, compile_statement, compile_value  # noqa: F401
