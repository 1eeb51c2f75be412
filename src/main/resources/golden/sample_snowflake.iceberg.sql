-- Converted from Snowflake Standard: ANALYTICS.DIM_CUSTOMER
CREATE OR REPLACE ICEBERG TABLE ANALYTICS.DIM_CUSTOMER (
    CUSTOMER_ID NUMBER(38,0) NOT NULL
        !!!RESOLVE EWI!!! /*** SSC-EWI-SF2ICE-0015 - IDENTITY/AUTOINCREMENT not supported in Iceberg tables ***/!!!,
    CUSTOMER_KEY VARCHAR(50) NOT NULL,
    FIRST_NAME VARCHAR(100),
    LAST_NAME VARCHAR(100),
    EMAIL VARCHAR(255),
    PHONE VARCHAR(20),
    ADDRESS VARCHAR
        !!!RESOLVE EWI!!! /*** SSC-EWI-SF2ICE-0001 - VARIANT not supported in Iceberg - converted to VARCHAR. Parse JSON at query time or use structured types ***/!!!,
    CREATED_AT TIMESTAMP_NTZ(6),
    UPDATED_AT TIMESTAMP_NTZ(6),
    IS_ACTIVE BOOLEAN,
    PRIMARY KEY (CUSTOMER_ID)
)
CATALOG = 'SNOWFLAKE'
EXTERNAL_VOLUME = '<EXTERNAL_VOLUME>'
BASE_LOCATION = 'analytics/dim_customer'

-- Original CLUSTER BY: (CUSTOMER_KEY)
-- NOTE: Iceberg uses automatic optimization instead of explicit clustering
-- Original DATA_RETENTION_TIME_IN_DAYS: 90
-- Original CHANGE_TRACKING: TRUE
-- UNIQUE (CUSTOMER_KEY)
-- NOTE: UNIQUE constraints are not enforced in Iceberg tables
-- Table comment: Customer dimension table
;

-- Converted from Snowflake Standard: ANALYTICS.FACT_SALES
CREATE OR REPLACE ICEBERG TABLE ANALYTICS.FACT_SALES (
    SALE_ID NUMBER(38,0) NOT NULL,
    CUSTOMER_ID NUMBER(38,0) NOT NULL,
    PRODUCT_ID NUMBER(38,0) NOT NULL,
    SALE_DATE DATE NOT NULL,
    QUANTITY NUMBER(10,0),
    UNIT_PRICE NUMBER(18,4),
    TOTAL_AMOUNT NUMBER(18,4),
    DISCOUNT_PCT NUMBER(5,2),
    TAX_AMOUNT NUMBER(18,4),
    PAYMENT_METHOD VARCHAR(50),
    SALES_REP_ID NUMBER(38,0),
    REGION VARCHAR(50),
    PRIMARY KEY (SALE_ID)
)
CATALOG = 'SNOWFLAKE'
EXTERNAL_VOLUME = '<EXTERNAL_VOLUME>'
BASE_LOCATION = 'analytics/fact_sales'

-- Original CLUSTER BY: (SALE_DATE, REGION)
-- NOTE: Iceberg uses automatic optimization instead of explicit clustering
-- FOREIGN KEY (CUSTOMER_ID) REFERENCES ANALYTICS.DIM_CUSTOMER(CUSTOMER_ID)
-- NOTE: Foreign keys are not enforced in Iceberg tables
;

-- Converted from Snowflake Standard: CATALOG.PRODUCTS
CREATE OR REPLACE ICEBERG TABLE CATALOG.PRODUCTS (
    PRODUCT_ID NUMBER(38,0) NOT NULL,
    SKU VARCHAR(50) NOT NULL,
    PRODUCT_NAME VARCHAR(200) NOT NULL,
    CATEGORY VARCHAR(100),
    SUBCATEGORY VARCHAR(100),
    DESCRIPTION VARCHAR(4000),
    UNIT_COST NUMBER(18,4),
    LIST_PRICE NUMBER(18,4),
    WEIGHT_KG FLOAT,
    DIMENSIONS VARCHAR
        !!!RESOLVE EWI!!! /*** SSC-EWI-SF2ICE-0002 - Semi-structured OBJECT not supported in Iceberg - converted to VARCHAR. Use structured OBJECT with defined schema instead ***/!!!,
    WAREHOUSE_LOCATION VARCHAR
        !!!RESOLVE EWI!!! /*** SSC-EWI-SF2ICE-0004 - GEOGRAPHY not supported in Iceberg - converted to VARCHAR. Store as WKT/GeoJSON string ***/!!!,
    TAGS VARCHAR
        !!!RESOLVE EWI!!! /*** SSC-EWI-SF2ICE-0003 - Semi-structured ARRAY not supported in Iceberg - converted to VARCHAR. Use structured ARRAY with defined element type instead ***/!!!,
    METADATA VARCHAR
        !!!RESOLVE EWI!!! /*** SSC-EWI-SF2ICE-0001 - VARIANT not supported in Iceberg - converted to VARCHAR. Parse JSON at query time or use structured types ***/!!!,
    CREATED_AT TIMESTAMP_NTZ(6),
    PRIMARY KEY (PRODUCT_ID)
)
CATALOG = 'SNOWFLAKE'
EXTERNAL_VOLUME = '<EXTERNAL_VOLUME>'
BASE_LOCATION = 'catalog/products'

-- UNIQUE (SKU)
-- NOTE: UNIQUE constraints are not enforced in Iceberg tables
-- Table comment: Product catalog with spatial data
;

-- Converted from Snowflake Standard: ANALYTICS.DIM_DATE
CREATE OR REPLACE ICEBERG TABLE ANALYTICS.DIM_DATE (
    DATE_KEY NUMBER(8,0) NOT NULL,
    FULL_DATE DATE NOT NULL,
    YEAR NUMBER(4,0),
    QUARTER NUMBER(1,0),
    MONTH NUMBER(2,0),
    MONTH_NAME VARCHAR(20),
    WEEK_OF_YEAR NUMBER(2,0),
    DAY_OF_MONTH NUMBER(2,0),
    DAY_OF_WEEK NUMBER(1,0),
    DAY_NAME VARCHAR(20),
    IS_WEEKEND BOOLEAN,
    IS_HOLIDAY BOOLEAN,
    FISCAL_YEAR NUMBER(4,0),
    FISCAL_QUARTER NUMBER(1,0),
    PRIMARY KEY (DATE_KEY)
)
CATALOG = 'SNOWFLAKE'
EXTERNAL_VOLUME = '<EXTERNAL_VOLUME>'
BASE_LOCATION = 'analytics/dim_date'
;

-- TEMPORARY table kept as Snowflake Standard (not converted to Iceberg)
-- Reason: Iceberg does not support temporary tables
-- The table will remain session-scoped as originally intended
CREATE OR REPLACE TEMPORARY TABLE STAGING.SESSION_CART (
    CART_ID NUMBER(38,0) NOT NULL,
    SESSION_ID VARCHAR(100) NOT NULL,
    PRODUCT_ID NUMBER(38,0),
    QUANTITY NUMBER(10,0),
    ADDED_AT TIMESTAMP_NTZ DEFAULT CURRENT_TIMESTAMP(),
    PRIMARY KEY (CART_ID)
);

-- TRANSIENT table kept as Snowflake Standard (not converted to Iceberg)
-- Reason: Iceberg tables always have durability (no transient option)
-- The table will remain without Fail-safe as originally intended
CREATE OR REPLACE TRANSIENT TABLE STAGING.STG_ORDERS (
    ORDER_ID NUMBER(38,0) NOT NULL,
    CUSTOMER_ID NUMBER(38,0),
    ORDER_DATE DATE,
    TOTAL_AMOUNT NUMBER(18,2),
    ORDER_STATUS VARCHAR(20),
    RAW_DATA VARIANT,
    LOAD_TIMESTAMP TIMESTAMP_LTZ DEFAULT CURRENT_TIMESTAMP()
);

-- !!!! DYNAMIC TABLE SKIPPED - Cannot convert to Iceberg !!!!
-- Table: ANALYTICS.DAILY_SALES_SUMMARY
-- Reason: Dynamic tables auto-refresh from a query and cannot be converted to Iceberg. Consider creating the underlying source tables as Iceberg instead.
-- Action required: Review and handle this table manually

-- !!!! EXTERNAL TABLE SKIPPED - Cannot convert to Iceberg !!!!
-- Table: RAW.EXT_CUSTOMER_EVENTS
-- Reason: External tables reference data in external stages. Consider using Iceberg tables with the same external volume instead.
-- Action required: Review and handle this table manually

-- !!!! HYBRID TABLE SKIPPED - Cannot convert to Iceberg !!!!
-- Table: OPERATIONAL.INVENTORY_LEVELS
-- Reason: Hybrid tables are optimized for HTAP workloads. Iceberg tables have different performance characteristics for mixed workloads.
-- Action required: Review and handle this table manually