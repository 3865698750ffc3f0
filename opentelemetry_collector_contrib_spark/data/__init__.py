from .transcripts import (  # noqa: F401
    TRANSCRIPTS_ORACLE_CTE,
    derive_transcripts,
    role_groups_df,
    synth_transcripts,
    tool_catalog_df,
)
