"""Reference stream semantics: the StockTrade data model, seeded generator,
lenient JSON wire format, envelope, and keyed sink (SURVEY.md §1, §2.A)."""
