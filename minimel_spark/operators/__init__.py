"""DataFrame -> DataFrame stage operators. Each module cites the reference
operators (SURVEY.md §2 IDs) it covers."""
