package graft.archive

import java.io.{StringReader, StringWriter}
import javax.xml.stream.{XMLInputFactory, XMLOutputFactory, XMLStreamConstants}

/** Channel configuration model + S12 XML import/export.
  *
  * Mirrors the reference's configuration surface
  * (ChannelConfiguration in ChannelMetaDataDAO.java, XML round-trip in
  * ArchiveServerConfigurationXmlExport/Import.java) with a fresh StAX
  * implementation: a channel has a rename-stable data id, a control
  * system type, an enabled flag, free-form options, and per-decimation-
  * level retention (seconds; period 0 = raw, retention 0 = forever).
  */
case class ChannelConfig(name: String, channelDataId: String,
                         controlSystemType: String, enabled: Boolean,
                         options: Map[String, String],
                         /** decimation period (s) → retention (s) */
                         levels: Map[Long, Long])

object ChannelConfigXml {

  /** Export a server's channel set. Deterministic order: channels by
    * name, levels by period, options by key.
    */
  def exportXml(serverId: String, channels: Seq[ChannelConfig]): String = {
    val sw = new StringWriter()
    val w = XMLOutputFactory.newInstance().createXMLStreamWriter(sw)
    w.writeStartDocument("UTF-8", "1.0")
    w.writeStartElement("server")
    w.writeAttribute("id", serverId)
    for (c <- channels.sortBy(_.name)) {
      w.writeStartElement("channel")
      w.writeAttribute("name", c.name)
      w.writeAttribute("data-id", c.channelDataId)
      w.writeAttribute("control-system-type", c.controlSystemType)
      w.writeAttribute("enabled", c.enabled.toString)
      for ((period, retention) <- c.levels.toSeq.sortBy(_._1)) {
        if (period == 0L) {
          w.writeEmptyElement("raw-samples")
          w.writeAttribute("retention", retention.toString)
        } else {
          w.writeEmptyElement("decimation-level")
          w.writeAttribute("period", period.toString)
          w.writeAttribute("retention", retention.toString)
        }
      }
      for ((k, v) <- c.options.toSeq.sortBy(_._1)) {
        w.writeEmptyElement("control-system-option")
        w.writeAttribute("name", k)
        w.writeAttribute("value", v)
      }
      w.writeEndElement()
    }
    w.writeEndElement()
    w.writeEndDocument()
    w.close()
    sw.toString
  }

  /** Parse an exported document back into configs (+ server id). */
  def importXml(xml: String): (String, Seq[ChannelConfig]) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(new StringReader(xml))
    var serverId = ""
    val channels = scala.collection.mutable.ArrayBuffer.empty[ChannelConfig]
    var cur: ChannelConfig = null
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          def attr(n: String): String = {
            val v = r.getAttributeValue(null, n)
            if (v == null) "" else v
          }
          r.getLocalName match {
            case "server" => serverId = attr("id")
            case "channel" =>
              cur = ChannelConfig(attr("name"), attr("data-id"),
                attr("control-system-type"), attr("enabled").toBoolean,
                Map.empty, Map.empty)
            case "raw-samples" =>
              cur = cur.copy(levels = cur.levels + (0L -> attr("retention").toLong))
            case "decimation-level" =>
              cur = cur.copy(levels = cur.levels +
                (attr("period").toLong -> attr("retention").toLong))
            case "control-system-option" =>
              cur = cur.copy(options = cur.options + (attr("name") -> attr("value")))
            case _ => ()
          }
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "channel" =>
          channels += cur; cur = null
        case _ => ()
      }
    }
    (serverId, channels.toSeq)
  }
}
