"""Package pybel_spark (+ the frozen fixtures it ships) into
dist/pybel_spark.zip for spark-submit --py-files."""
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    dist = os.path.join(REPO, 'dist')
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, 'pybel_spark.zip')
    with zipfile.ZipFile(out, 'w', zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(REPO, 'pybel_spark')):
            if '__pycache__' in root:
                continue
            for name in files:
                path = os.path.join(root, name)
                zf.write(path, os.path.relpath(path, REPO))
        for fixture in ('pool.json', 'resources.json'):
            path = os.path.join(REPO, 'fixtures', fixture)
            zf.write(path, os.path.join('fixtures', fixture))
    print('wrote', out)


if __name__ == '__main__':
    main()
