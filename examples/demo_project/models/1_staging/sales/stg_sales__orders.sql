SELECT
    o_orderkey,
    o_custkey,
    o_orderdate,
    o_totalprice
FROM {{ source('raw', 'orders') }}
