package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration`, so executor
  * tasks resolve paths (fs.defaultFS, credentials, scheme → FileSystem
  * bindings) exactly as the driver does. `Configuration` itself is
  * `Writable` but not `Serializable`; this bridges the two.
  */
class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {

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
