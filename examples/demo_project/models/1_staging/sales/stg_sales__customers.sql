SELECT
    c_custkey,
    c_name,
    c_mktsegment,
    c_acctbal
FROM {{ source('raw', 'customer') }}
WHERE c_acctbal >= {{ var('min_balance') }}
