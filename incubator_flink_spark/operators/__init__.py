"""Custom operators the Spark built-ins lack, each a composition of
DataFrame ops (preferred) or an Arrow-batched pandas UDF. See SURVEY.md §2
for the reference operator each mirrors."""
