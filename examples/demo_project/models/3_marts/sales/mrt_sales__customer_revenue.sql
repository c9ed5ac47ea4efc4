SELECT
    c.c_custkey,
    c.c_name,
    c.c_mktsegment,
    SUM(o.o_totalprice) AS revenue,
    COUNT(*) AS n_orders
FROM {{ ref('stg_sales__orders') }} o
JOIN {{ ref('stg_sales__customers') }} c
  ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
