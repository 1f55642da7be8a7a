package graft.sources.netcdf

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop Configuration, so executor
  * tasks resolve FileSystems with the session's settings (fs.*
  * credentials, spark.hadoop.* overrides) instead of a bare
  * `new Configuration()`. Hadoop's own write/readFields do the
  * round-trip. */
class SerializableHadoopConf(@transient var value: Configuration) extends Serializable {
  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
