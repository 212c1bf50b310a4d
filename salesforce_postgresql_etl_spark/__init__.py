"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of the reference `jaybythebay/salesforce-postgresql-etl`
(reference source tree is empty in this environment — see SURVEY.md §0;
the capability contract is SURVEY.md §2).

Architecture: everything is expressed through the PySpark DataFrame / SQL
API so Catalyst owns optimization (predicate pushdown, column pruning,
join selection, AQE). Python touches data only through Arrow-batched
pandas UDFs, and only where no builtin exists.
"""

__version__ = "0.1.0"
