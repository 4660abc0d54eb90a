package org.apache.spark.sql.execution.datasources.parquet;

import java.io.IOException;
import org.apache.parquet.column.page.PageReadStore;
import org.apache.parquet.hadoop.ParquetFileReader;
import org.apache.parquet.schema.MessageType;

/**
 * {@code SpecificParquetRecordReaderBase.ParquetRowGroupReader} and the
 * schema-based {@code initialize} overload are package-private to
 * Spark; this shim re-exposes the one entry point graft's columnar
 * reader needs: initializing a {@link VectorizedParquetRecordReader}
 * from an ALREADY-OPEN {@link ParquetFileReader}. The file reader was
 * opened with the session's Hadoop configuration, so the vectorized
 * path works on ANY Hadoop filesystem — the
 * {@code initialize(path, columns)} convenience overload builds a fresh
 * default {@code Configuration} internally and only resolves
 * {@code file:} URIs. The vectorized reader takes ownership of the file
 * reader (its {@code close()} closes it).
 */
public final class GraftParquetReadShim {
  private GraftParquetReadShim() {}

  public static void initVectorized(
      VectorizedParquetRecordReader reader,
      MessageType fileSchema,
      MessageType requestedSchema,
      ParquetFileReader fileReader,
      long totalRowCount) throws IOException {
    if (totalRowCount > Integer.MAX_VALUE) {
      throw new IllegalArgumentException(
          "fragment part file holds " + totalRowCount + " rows; the "
              + "vectorized reader counts rows in Int — split the write "
              + "into more tasks");
    }
    reader.initialize(fileSchema, requestedSchema,
        new GraftRowGroupReader(fileReader), (int) totalRowCount);
  }

  /** The package-private row-group contract over an open file reader
   * (Spark's own Impl class is private). */
  private static final class GraftRowGroupReader
      implements SpecificParquetRecordReaderBase.ParquetRowGroupReader {
    private final ParquetFileReader reader;

    GraftRowGroupReader(ParquetFileReader reader) {
      this.reader = reader;
    }

    @Override
    public PageReadStore readNextRowGroup() throws IOException {
      return reader.readNextRowGroup();
    }

    @Override
    public void close() throws IOException {
      reader.close();
    }
  }
}
