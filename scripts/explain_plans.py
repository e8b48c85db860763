"""Print the physical plans documented in PLANS.md."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pybel_spark.corpus import generate_documents
from pybel_spark.pipeline import build_graph, extract_triples
from pybel_spark.session import get_spark


def main():
    spark = get_spark(app_name='explain-plans', cores=8)
    spark.sparkContext.setLogLevel('ERROR')
    tmp = '/tmp/pybel_spark_plan_docs'
    generate_documents(spark, 100).write.mode('overwrite').parquet(tmp)
    docs = spark.read.parquet(tmp)

    print('=' * 30, 'extract_triples')
    extract_triples(docs).explain('formatted')

    print('=' * 30, 'build_graph().edges')
    build_graph(docs).edges.explain('formatted')

    print('=' * 30, 'pushdown check')
    dd = spark.read.parquet('/root/testdata/sf0.01/documents.parquet')
    dd.where("lang = 'en'").select(
        'doc_id', F.size(F.split(F.trim('text'), r'\s+')).alias('n')
    ).explain('formatted')
    spark.stop()


if __name__ == '__main__':
    main()
