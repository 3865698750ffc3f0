from .transcripts import (  # noqa: F401
    ROLE_GROUPS_ORACLE_CTE,
    TOOL_CATALOG_ORACLE_CTE,
    TRANSCRIPTS_ORACLE_CTE,
    derive_transcripts,
    role_groups_df,
    synth_transcripts,
    tool_catalog_df,
)
