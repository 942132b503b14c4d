"""Pure scalar/parse functions shared by the oracle and the Ray stages.

Each module reproduces one operator family of the reference
(file:line citations into /root/reference in the docstrings).
"""
