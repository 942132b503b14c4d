"""Pipeline compositions: the flagship extraction DAG and the
relational / text / dedup / similarity query library."""
