"""Sources: deterministic fixture/corpus generators and table I/O."""
