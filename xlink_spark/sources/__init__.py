"""Sources & sinks (SURVEY §2.1): corpus standardization, dictionary files,
TTL dumps, word2vec binaries, gold datasets."""
