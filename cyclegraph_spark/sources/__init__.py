from cyclegraph_spark.sources.pages import (
    PAGES_SCHEMA,
    build_alias_rows,
    alias_df,
    page_record,
    pages_df,
)

__all__ = ["PAGES_SCHEMA", "build_alias_rows", "alias_df", "page_record", "pages_df"]
