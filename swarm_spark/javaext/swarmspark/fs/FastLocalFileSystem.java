package swarmspark.fs;

import org.apache.hadoop.fs.LocalFileSystem;

/** LocalFileSystem (checksummed) over FastRawLocalFileSystem -- see
 *  that class for why. Wire with
 *  spark.hadoop.fs.file.impl=swarmspark.fs.FastLocalFileSystem. */
public class FastLocalFileSystem extends LocalFileSystem {
  public FastLocalFileSystem() {
    super(new FastRawLocalFileSystem());
  }
}
